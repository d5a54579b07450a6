"""Runtime configuration for interpn-tpu.

The reference library (jlogan03/interpn) is f64-first: its Python API operates
on float64 by default and promises ~1e-13-level agreement on its tests. JAX
disables 64-bit types by default, so we enable x64 mode at import unless the
user opts out with INTERPN_TPU_NO_X64=1. All interpn-tpu code paths pass
explicit dtypes everywhere, so enabling x64 only *allows* f64 — it does not
change the dtype of any interpn-tpu result.

On TPU, float64 is software-emulated and slow; use float32 inputs for
throughput-critical workloads (the f32 code path is identical).
"""

from __future__ import annotations

import os

import jax


def host_feature_tag() -> str:
    """Short fingerprint of this host's CPU feature set (plus jaxlib).

    XLA:CPU AOT-caches executables compiled for the exact host ISA features;
    loading them on a host lacking those features is unsafe (the
    ``cpu_aot_loader`` "could lead to execution errors such as SIGILL"
    warning wall). Keying the default persistent-cache path by this tag
    turns cross-host artifact reuse into a clean cache MISS instead of a
    hazard, and makes the warmed artifact (scripts/warm_cache.py)
    self-describing about the host it is valid for."""
    import hashlib
    import platform

    feats = [platform.machine(), getattr(jax, "__version__", "")]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 exposes "flags", arm64 "Features"
                if line.startswith(("flags", "Features")):
                    feats.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:  # pragma: no cover - non-procfs platforms
        pass
    return hashlib.blake2b("|".join(feats).encode(), digest_size=6).hexdigest()


def _setup() -> None:
    if os.environ.get("INTERPN_TPU_NO_X64", "0") not in ("1", "true", "True"):
        jax.config.update("jax_enable_x64", True)

    # Persistent XLA compilation cache: first-compile of the large-batch TPU
    # executables can take tens of seconds; caching makes every subsequent
    # process start instant. (The TPU-native replacement for the reference's
    # PGO pipeline: instead of profile-guided re-compilation, ahead-of-time
    # compiled executables are cached and reused — see scripts/warm_cache.py.)
    # The default path is keyed by the host feature tag; an explicit
    # INTERPN_TPU_CACHE_DIR is honored verbatim (the user owns the risk).
    cache_dir = os.environ.get("INTERPN_TPU_CACHE_DIR")
    if cache_dir is None:
        # The persistent cache is a TPU/PGO deployment artifact. XLA:CPU AOT
        # entries warn spuriously on load even same-host (tuning
        # pseudo-features like +prefer-no-gather never appear in the
        # loader's feature probe), so a process pinned to CPU before import
        # skips the default cache; an explicit INTERPN_TPU_CACHE_DIR still
        # opts in.
        if (getattr(jax.config, "jax_platforms", None) or "") == "cpu":
            return
        cache_dir = os.path.expanduser(
            os.path.join("~/.cache/interpn_tpu_xla", host_feature_tag())
        )
    if cache_dir and cache_dir != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass


_setup()

# Index dtype used for all cell-location and gather arithmetic. Grids are
# bounded well below 2^31 elements, and int32 index math is significantly
# faster than int64 on TPU.
INDEX_DTYPE = "int32"
