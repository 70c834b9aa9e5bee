"""Producing-commit identity for sealing artifacts.

Every seal artifact (oracle sweep, plan audit, scaling evidence) embeds
the git sha it was produced at, so "this artifact matches this code" is
checkable from git history alone — a post-seal commit that regenerates
an artifact byte-identically is otherwise unprovable without re-running
the whole sweep (the round-8 fourth-seal gap).
"""

from __future__ import annotations

import subprocess


def git_head(repo: str = "/root/repo") -> str:
    """HEAD sha, suffixed ``-dirty`` when the working tree differs from
    it (an artifact produced from a dirty tree proves nothing about any
    commit, and says so)."""
    try:
        sha = subprocess.run(
            ["git", "-C", repo, "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "-C", repo, "status", "--porcelain"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        return sha + ("-dirty" if dirty else "")
    except Exception:
        return "unknown"
