"""YAML hyperparameter store with comment-preserving in-place editing.

Semantics-compatible rebuild of the reference's `YAMLHParams`
(`mpunet/hyperparameters/hparams.py`): a dict of config groups parsed from a
single `train_hparams.yaml`, which also keeps the *raw YAML text* synchronized
so that programmatic edits (e.g. the Auditor pushing inferred values back into
the file) preserve the user's comments and the `__CB_*` callback anchors.

Differences from the reference: built on PyYAML (ruamel is not available in
this environment — the raw-text sync is what preserves formatting, so the
parser only needs to read), and version stamping records this package's
version/git state.
"""

from __future__ import annotations

import os
import re
import subprocess
from pathlib import Path

import numpy as np
import yaml

from multiplanarunet_tpu.logging.loggers import ScreenLogger

_GROUP_RE = re.compile(r"^(?![ \t\n#])([A-Za-z_][^\s:]*):", re.MULTILINE)


def _git_info(repo_dir):
    """(branch, commit) of the repo containing this package, or Nones."""
    def run(*args):
        try:
            return subprocess.run(
                ["git", *args], cwd=repo_dir, capture_output=True, text=True,
                timeout=5,
            ).stdout.strip() or None
        except Exception:
            return None

    return run("rev-parse", "--abbrev-ref", "HEAD"), run("rev-parse", "HEAD")


class VersionController:
    """Reports the framework version + git branch/commit for config stamping,
    and (when the package lives in a git checkout) can move that checkout to
    a version tag/branch — the reference's git-subprocess version controller
    (`mpunet/bin/version/version_controller.py:30-85`)."""

    def __init__(self, logger=None):
        import multiplanarunet_tpu

        self.logger = logger or ScreenLogger()
        self.version = multiplanarunet_tpu.__version__
        self.git_path = str(Path(multiplanarunet_tpu.__file__).parent.parent)
        self.branch, self.commit = _git_info(self.git_path)

    def check_git(self):
        """True when the package sits inside a usable git checkout."""
        return (self.commit is not None
                and os.path.exists(os.path.join(self.git_path, ".git")))

    def _git(self, *args):
        out = subprocess.run(
            ["git", *args], cwd=self.git_path, capture_output=True,
            text=True, timeout=30,
        )
        if out.returncode != 0:
            raise OSError(
                f"git {' '.join(args)} failed: {out.stderr.strip()}"
            )
        return out.stdout.strip()

    def set_branch(self, branch):
        """Check the package repo out at `branch` (a branch or tag name)
        (parity: `version_controller.py:82-83`)."""
        if not self.check_git():
            raise OSError(
                f"'{self.git_path}' is not a git checkout; cannot switch "
                f"versions of an installed (non-git) package."
            )
        self._git("checkout", str(branch))
        self.branch, self.commit = _git_info(self.git_path)

    def set_commit(self, commit_id):
        """Hard-reset the package repo to `commit_id`
        (parity: `version_controller.py:79-80`)."""
        if not self.check_git():
            raise OSError(f"'{self.git_path}' is not a git checkout.")
        self._git("reset", "--hard", str(commit_id))
        self.branch, self.commit = _git_info(self.git_path)

    def set_version(self, version):
        """Check out version tag/branch ``v<version>``
        (parity: `version_controller.py:76-78` — strips a leading 'v')."""
        version = str(version).lower().strip(" v")
        self.set_branch(f"v{version}")

    def check_or_warn(self, recorded_version, logger=None):
        logger = logger or self.logger
        if recorded_version and str(recorded_version) != str(self.version):
            logger.warn(
                f"Parameter file created under framework version "
                f"'{recorded_version}' but the installed version is "
                f"'{self.version}'. Results may differ."
            )


class YAMLHParams(dict):
    """Dict of hyperparameter groups + synchronized raw YAML string."""

    def __init__(self, yaml_path, logger=None, no_log=False,
                 no_version_control=False, **kwargs):
        super().__init__(**{k: v for k, v in kwargs.items() if k != "package"})
        self.logger = logger or ScreenLogger()
        self.yaml_path = os.path.abspath(str(yaml_path))
        self.project_path = os.path.split(self.yaml_path)[0]
        self.no_log = no_log

        if not os.path.exists(self.yaml_path):
            raise OSError(f"YAML path '{self.yaml_path}' does not exist")
        with open(self.yaml_path) as f:
            self.string_rep = f.read()
        parsed = yaml.safe_load(self.string_rep) or {}
        # __CB-prefixed groups are anchor definitions for the callback list;
        # they live only in the string representation
        self.update({k: v for k, v in parsed.items() if not k.startswith("__CB")})

        if not self.no_log:
            self.logger(f"YAML path:    {self.yaml_path}")

        if not no_version_control:
            vc = VersionController(logger=self.logger)
            vc.check_or_warn(self.get("__VERSION__"), self.logger)
            for name, value in (
                ("__VERSION__", vc.version),
                ("__BRANCH__", vc.branch),
                ("__COMMIT__", vc.commit),
            ):
                if value is not None:
                    self.set_value(None, name, value, overwrite=True,
                                   add_if_missing=True, log=False)
            self.save_current()

    # ----------------------------------------------------------- group access
    @property
    def groups(self):
        """Top-level group names in file order (from the raw string)."""
        return [m.group(1) for m in _GROUP_RE.finditer(self.string_rep)]

    def _group_span(self, group_name):
        """(start, end) character span of a group's text in string_rep."""
        matches = list(_GROUP_RE.finditer(self.string_rep))
        for i, m in enumerate(matches):
            if m.group(1) == group_name:
                start = m.start()
                end = matches[i + 1].start() if i + 1 < len(matches) else len(self.string_rep)
                return start, end
        raise KeyError(f"No group '{group_name}' in YAML string")

    def get_group(self, group_name):
        start, end = self._group_span(group_name)
        return self.string_rep[start:end]

    def add_group(self, yaml_string):
        yaml_string = yaml_string.strip("\n")
        parsed = yaml.safe_load(yaml_string)
        (group_name,) = parsed.keys()
        self[group_name] = parsed[group_name]
        self.string_rep = self.string_rep.rstrip("\n") + "\n\n" + yaml_string + "\n"

    def delete_group(self, group_name):
        start, end = self._group_span(group_name)
        self.string_rep = self.string_rep[:start] + self.string_rep[end:]
        del self[group_name]

    # ------------------------------------------------------------ key lookup
    def get_from_anywhere(self, key, default=None):
        """Search all groups for `key`; error-log if it appears in several."""
        hits = []
        for group_name, group in self.items():
            try:
                present = key in group
            except TypeError:
                present = False
            if present:
                hits.append((group_name, group[key]))
        if len(hits) > 1:
            self.logger(
                f"[ERROR] Found key '{key}' in multiple groups "
                f"({[h[0] for h in hits]})"
            )
        return hits[0][1] if hits else default

    def log(self):
        for key in self:
            self.logger(f"{key}\t\t{self[key]}")

    # --------------------------------------------------------------- editing
    @staticmethod
    def _format_value(value):
        if isinstance(value, np.ndarray):
            return np.array2string(value, separator=", ")
        if value is None:
            return "Null"
        return str(value)

    def _rewrite_line(self, text, name, str_value):
        """Replace the value of the first 'name:' line in `text`; None if absent."""
        lines = text.split("\n")
        for i, line in enumerate(lines):
            stripped = line.lstrip()
            if stripped.startswith(name) and stripped[len(name):].lstrip().startswith(":"):
                indent = line[: len(line) - len(stripped)]
                lines[i] = f"{indent}{name}: {str_value}"
                return "\n".join(lines)
        return None

    def set_value(self, subdir, name, value, overwrite=False,
                  add_if_missing=True, log=True):
        """Set `name` (optionally under group `subdir`) in memory AND in the
        raw YAML text, preserving all other formatting/comments."""
        str_value = self._format_value(value)
        status = None

        if subdir is None:
            exists = name in self
            if exists and self.get(name) is not None and not overwrite:
                status = (f"Item '{name}' already set with value "
                          f"'{self[name]}'. Skipping (overwrite=False).")
            elif exists:
                new = self._rewrite_line(self.string_rep, name, str_value)
                if new is None:
                    raise AttributeError(f"No line found for field '{name}'")
                self.string_rep = new
                self[name] = value
            elif not add_if_missing:
                raise AttributeError(
                    f"Entry '{name}' does not exist (add_if_missing=False)"
                )
            else:
                self.string_rep = self.string_rep.rstrip("\n") + \
                    f"\n\n{name}: {str_value}\n"
                self[name] = value
        else:
            if subdir not in self:
                if not add_if_missing:
                    raise AttributeError(f"Subdir '{subdir}' does not exist")
                self.add_group(f"{subdir}:\n  {name}: {str_value}")
                status = f"Created subdir '{subdir}' (add_if_missing=True)"
            else:
                exists = name in self[subdir]
                if exists and self[subdir].get(name) is not None and not overwrite:
                    status = (f"Entry '{name}' already set in subdir "
                              f"'{subdir}' with value '{self[subdir][name]}'. "
                              f"Skipping (overwrite=False).")
                elif exists:
                    start, end = self._group_span(subdir)
                    group_text = self.string_rep[start:end]
                    new = self._rewrite_line(group_text, name, str_value)
                    if new is None:
                        raise AttributeError(
                            f"No line for field '{name}' in group '{subdir}'"
                        )
                    self.string_rep = self.string_rep[:start] + new + self.string_rep[end:]
                    self[subdir][name] = value
                elif not add_if_missing:
                    raise AttributeError(
                        f"Entry '{name}' not in subdir '{subdir}' "
                        f"(add_if_missing=False)"
                    )
                else:
                    start, end = self._group_span(subdir)
                    group_text = self.string_rep[start:end].rstrip(" \n")
                    new_group = f"{group_text}\n  {name}: {str_value}\n"
                    self.string_rep = self.string_rep[:start] + new_group + self.string_rep[end:]
                    self[subdir][name] = value

        if log:
            self.logger(status or
                        f"Setting value '{str_value}' (type {type(value).__name__}) "
                        f"in subdir '{subdir}' with name '{name}'")

    def save_current(self, out_path=None):
        # Multi-process runs share the project dir: every process holds an
        # identical in-memory config (audit + view broadcast), so only the
        # main process persists it — concurrent truncate+write of the same
        # YAML from several processes can interleave.
        from multiplanarunet_tpu.parallel import is_main_process

        if not is_main_process():
            return
        out_path = os.path.abspath(out_path or self.yaml_path)
        if not self.no_log:
            self.logger(f"Saving current YAML configuration to file: {out_path}")
        with open(out_path, "w") as f:
            f.write(self.string_rep)
