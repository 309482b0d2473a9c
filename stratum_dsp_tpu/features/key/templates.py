"""Key templates: Krumhansl-Kessler (1982) and Temperley (1999) profiles.

Mirror of reference ``features/key/templates.rs:64-223``. The base C-profiles
are the standard published constants (Krumhansl & Kessler 1982; Temperley
1999); each is rotated to all 12 tonics and L2-normalized so dot products
against L2-normalized chroma behave like cosine similarity.

Template tensor layout: ``[24, 12]`` with rows 0-11 = major C..B,
rows 12-23 = minor C..B — matching the flat key index used across the
pipeline (``result.Key.index``).
"""

from __future__ import annotations

import functools

import numpy as np

from ...config import TemplateSet

# Krumhansl & Kessler (1982) C-major / C-minor probe-tone profiles.
KK_MAJOR = (6.35, 2.23, 3.48, 2.33, 4.38, 4.09, 2.52, 5.19, 2.39, 3.66, 2.29, 2.88)
KK_MINOR = (6.33, 2.68, 3.52, 5.38, 2.60, 3.53, 2.54, 4.75, 3.98, 2.69, 3.34, 3.17)

# Temperley (1999) C-major / C-minor profiles.
TEMPERLEY_MAJOR = (5.0, 2.0, 3.5, 2.0, 4.5, 4.0, 2.0, 4.5, 2.0, 3.5, 1.5, 4.0)
TEMPERLEY_MINOR = (5.0, 2.0, 3.5, 5.0, 2.0, 3.5, 2.0, 4.5, 3.5, 2.0, 4.0, 3.5)


def _rotate_and_normalize(c_major, c_minor) -> np.ndarray:
    """Rotate base profiles to all 24 keys (templates.rs:117-131) and
    L2-normalize each row (templates.rs:134-146)."""
    out = np.zeros((24, 12), dtype=np.float32)
    cmaj = np.asarray(c_major, dtype=np.float64)
    cmin = np.asarray(c_minor, dtype=np.float64)
    for key in range(12):
        idx = (np.arange(12) + 12 - key) % 12
        out[key] = cmaj[idx]
        out[12 + key] = cmin[idx]
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / np.maximum(norms, 1e-12)).astype(np.float32)


@functools.lru_cache(maxsize=4)
def key_templates(template_set: TemplateSet = TemplateSet.KRUMHANSL_KESSLER) -> np.ndarray:
    """The [24, 12] template matrix for the given set."""
    if template_set == TemplateSet.KRUMHANSL_KESSLER:
        return _rotate_and_normalize(KK_MAJOR, KK_MINOR)
    if template_set == TemplateSet.TEMPERLEY:
        return _rotate_and_normalize(TEMPERLEY_MAJOR, TEMPERLEY_MINOR)
    raise ValueError(f"unknown template set {template_set}")
