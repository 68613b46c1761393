#!/usr/bin/env python
"""Local CI driver (parity: the reference's ``scripts/run_dev_checks.py`` —
which ran isort/black/pytest/sphinx).  Here: compile-check all sources,
build the native library, run the test suite, and smoke the training CLIs.
"""

from __future__ import annotations

import argparse
import pathlib
import py_compile
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def run(cmd, **kw):
    print(f"$ {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, cwd=ROOT, **kw).returncode


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true", help="skip CLI smokes")
    args = p.parse_args()

    failures = []

    # 1. compile-check every python file
    n = 0
    for f in ROOT.rglob("*.py"):
        if ".git" in f.parts:
            continue
        try:
            py_compile.compile(str(f), doraise=True)
            n += 1
        except py_compile.PyCompileError as e:
            failures.append(f"compile: {e}")
    print(f"compiled {n} python files")

    # 2. native build
    if run(["make", "-C", "native"]) != 0:
        failures.append("native build")

    # 3. tests
    if run([sys.executable, "-m", "pytest", "tests/", "-q"]) != 0:
        failures.append("pytest")

    # 4. CLI smokes
    if not args.fast:
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            ckpt = f"{tmp}/ngp_ckpt"
            for script, extra in [
                ("examples/train_mlp_nerf.py", []),
                ("examples/train_ngp_nerf_occ.py", ["--model_path", ckpt]),
                ("examples/train_ngp_nerf_prop.py", []),
                ("examples/train_mlp_tnerf.py", []),
                ("examples/train_barf.py", []),
            ]:
                if run(
                    [sys.executable, script, "--smoke", "--cpu",
                     "--max_steps", "30"] + extra
                ) != 0:
                    failures.append(f"smoke: {script}")
            # inference renderer from the saved orbax checkpoint
            if run(
                [sys.executable, "examples/render.py", "--cpu",
                 "--model_path", ckpt, "--chunk", "4608",
                 "--max_samples", "128"]
            ) != 0:
                failures.append("smoke: examples/render.py")

    if failures:
        print("FAILED:", failures)
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
