"""Codec auto-selection (VERDICT r3 #8).

The engine carries two realizations of each image seam:

- deterministic stubs (``functions/imagekit.py`` NEKO1 decode,
  ``stages/scorer.PseudoCatScorer``) — the TEST default, importable
  everywhere, byte-reproducible;
- real adapters (``functions/imagekit_pil.py`` Pillow decode,
  ``stages/scorer.YoloCatScorer`` ultralytics) — reference behavior
  (yolo_cat_detector.py:57-75, advanced_cleaning.py:96-121), usable only
  where the libraries exist.

These selectors pick the real adapter when its libraries import cleanly
and fall back to the stub otherwise, so the CLI / real-data entry points
get reference behavior by default on a capable machine while fixture
pipelines (which synthesize NEKO1 bytes) keep pinning the stub
explicitly. ``prefer_real=False`` forces the stub (what the synthetic
call sites pass).
"""

from __future__ import annotations


def have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def have_ultralytics() -> bool:
    """YoloCatScorer needs both ultralytics and Pillow."""
    try:
        import ultralytics  # noqa: F401

        return have_pil()
    except ImportError:
        return False


def select_decode_features(prefer_real: bool = True):
    """decode_features(blob) -> dict: PIL-backed when Pillow is present
    (and ``prefer_real``), else the deterministic NEKO1 stub."""
    if prefer_real and have_pil():
        from .imagekit_pil import decode_features as real_decode

        return real_decode
    from .imagekit import decode_features as stub_decode

    return stub_decode


def select_scorer_cls(prefer_real: bool = True):
    """Scorer actor class: YoloCatScorer when ultralytics+Pillow import
    cleanly (and ``prefer_real``), else the deterministic PseudoCatScorer."""
    if prefer_real and have_ultralytics():
        from ..stages.scorer import YoloCatScorer

        return YoloCatScorer
    from ..stages.scorer import PseudoCatScorer

    return PseudoCatScorer
