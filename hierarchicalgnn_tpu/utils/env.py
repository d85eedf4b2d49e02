"""Toolchain fingerprinting.

Two consumers:
  * ``bench.py`` records the full fingerprint (plus a fixed-shape
    reference kernel time) so round-over-round perf drift is attributable
    to service/toolchain changes vs repo changes.
  * the Trainer's fused-step crash canary (``train/trainer.py``): the
    Embedding-HGNN-GMM packed grad+update program SIGSEGVs the TPU
    compiler under the toolchain recorded in its shipped config
    (``force_split_step_env``); when the live fingerprint differs, the
    packed compile is re-tried once instead of staying disabled forever.
"""

from __future__ import annotations


def toolchain_fingerprint() -> dict:
    """Version identity of the compile toolchain (no device work)."""
    import importlib.metadata as md

    import jax

    fp = {"jax": jax.__version__}
    for pkg in ("jaxlib", "libtpu"):
        try:
            fp[pkg] = md.version(pkg)
        except md.PackageNotFoundError:
            fp[pkg] = None
    return fp
