"""Experiment bookkeeping: commit run configs/logs into git.

Parity target: reference code/tools/commit.py + the gitpython auto-commits
in the runner (volsdf_train.py:232-235,245-250) — record runconf.conf and
train.log snapshots in version control with an 'expbot' author. Implemented
over the git CLI (gitpython is not in this image).
"""

from __future__ import annotations

import argparse
import os.path as osp
import subprocess
from pathlib import Path


def git(repo: str, *args: str) -> str:
    out = subprocess.run(
        ["git", "-C", repo, *args], capture_output=True, text=True, check=True
    )
    return out.stdout.strip()


def commit_experiment(rundir: str, message: str = None, repo: str = None) -> None:
    rundir = Path(rundir).resolve()
    repo = repo or git(str(rundir), "rev-parse", "--show-toplevel")
    targets = [p for p in (rundir / "runconf.conf", rundir / "train.log") if p.exists()]
    if not targets:
        raise SystemExit(f"nothing to commit under {rundir}")
    git(repo, "add", "-f", *[str(t) for t in targets])
    msg = message or f"experiment snapshot {rundir.name}"
    # pathspec-limited commit: never sweep unrelated pre-staged changes
    subprocess.run(
        [
            "git", "-C", repo,
            "-c", "user.name=expbot", "-c", "user.email=expbot",
            "commit", "-m", msg, "--allow-empty", "--",
            *[str(t) for t in targets],
        ],
        check=True,
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--rundir", required=True, help="experiment timestamp dir")
    parser.add_argument("--message", default=None)
    args = parser.parse_args(argv)
    commit_experiment(args.rundir, args.message)


if __name__ == "__main__":
    main()
