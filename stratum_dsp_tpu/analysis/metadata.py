"""Standalone analysis-metadata struct (parity with the reference's
``src/analysis/metadata.rs:1-30``).

The reference keeps an older ``AnalysisMetadata`` in ``analysis/metadata.rs``
that was superseded by the richer version embedded in ``analysis/result.rs``
(which this repo mirrors as ``result.AnalysisMetadata``). It is ported here
for inventory completeness; new code should use ``result.AnalysisMetadata``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from .. import __version__
from ..result import AnalysisFlag


@dataclass
class LegacyAnalysisMetadata:
    """Mirror of the superseded struct (metadata.rs:7-19)."""

    algorithm_version: str = __version__
    onset_method_consensus: float = 0.0
    methods_used: List[str] = field(default_factory=list)
    flags: List[AnalysisFlag] = field(default_factory=list)
