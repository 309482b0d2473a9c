"""Repo-relative path resolution for the validation scripts.

Counterpart of the reference's ``validation/_paths.py``: keeps the tools
runnable from any CWD by walking upward to the repository root. The root
marker here is the ``stratum_dsp_tpu`` package directory (the reference keys
off ``Cargo.toml``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


def find_repo_root(start: Optional[Path] = None) -> Path:
    """Walk upward from ``start`` (default: this file) until a directory
    containing the ``stratum_dsp_tpu`` package is found."""
    p = (start or Path(__file__)).resolve()
    for cand in [p] + list(p.parents):
        if (cand / "stratum_dsp_tpu" / "__init__.py").exists():
            return cand
    raise RuntimeError(f"could not locate the repo root from: {p}")


def resolve_data_path(data_path_arg: str, repo_root: Optional[Path] = None) -> Path:
    """Resolve a ``--data-path``-style argument: absolute paths pass through,
    relative ones resolve against the repo root."""
    p = Path(data_path_arg)
    if p.is_absolute():
        return p
    return ((repo_root or find_repo_root()) / p).resolve()
