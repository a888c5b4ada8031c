"""`mp version`: print framework version + git state.

Parity surface: `mpunet/bin/version/version_controller.py` (read-only
portion; checkout-by-tag is deliberately not supported)."""

from __future__ import annotations


def entry_func(args=None):
    from multiplanarunet_tpu.hyperparameters.hparams import VersionController

    vc = VersionController()
    print(f"version: {vc.version}")
    print(f"branch:  {vc.branch}")
    print(f"commit:  {vc.commit}")


if __name__ == "__main__":
    entry_func()
