"""mp3tpu: TPU-native MPEG-1/2 audio encoder (Layers I-III).

A from-scratch JAX/XLA re-design of the ISO dist10-lineage reference
encoder (lieff/mp3-enc-bsd): device-side psychoacoustics, filterbank,
MDCT, rate loop and Huffman bit packing; native C++ bitstream
assembly; byte-exact NumPy oracle + decoder for verification.
"""
import os

_CACHE_DONE = False


def ensure_compile_cache():
    """Persistent XLA compilation cache: the encoder's fixed-size
    programs compile once per machine, not once per process.  Disable
    with MP3TPU_COMPILE_CACHE=0; point elsewhere with a path.

    Called lazily from the encode entry points, AFTER jax has picked a
    backend: XLA:CPU AOT cache entries are machine-feature-pinned and
    can SIGILL when loaded under a different feature detection pass, so
    the persistent cache is enabled only for TPU backends.  (An env
    check at import time is not enough -- JAX_PLATFORMS may say "axon"
    while tests pin the backend to cpu via jax.config.)"""
    global _CACHE_DONE
    if _CACHE_DONE:
        return
    _CACHE_DONE = True
    path = os.environ.get("MP3TPU_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/mp3tpu/xla"))
    if path in ("0", ""):
        return
    try:
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only home: in-process cache only
