"""`mp run_tests`: run the framework test suite via pytest.

Parity surface: `mpunet/bin/run_tests.py` (unittest runner); this framework's
tests are pytest-based and live in <repo>/tests."""

from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path


def get_argparser():
    parser = ArgumentParser(description="Run the test suite")
    parser.add_argument("--tests", type=str, default="all",
                        help="'all' or a test-file substring filter")
    return parser


def entry_func(args=None):
    import pytest

    args = get_argparser().parse_args(args)
    test_dir = Path(__file__).parent.parent.parent / "tests"
    pytest_args = ["-q", str(test_dir)]
    if args.tests != "all":
        pytest_args += ["-k", args.tests]
    raise SystemExit(pytest.main(pytest_args))


if __name__ == "__main__":
    entry_func()
