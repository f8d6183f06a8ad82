"""softgroup_tpu — a TPU-native (JAX/XLA/Pallas) framework for 3D point-cloud
instance / semantic / panoptic segmentation with the capabilities of
SoftGroup / SoftGroup++ (reference: /root/reference, thangvubk/SoftGroup).

Built from scratch for TPU: the sparse 3D U-Net backbone runs as padded,
blocked gather-GEMM-scatter over a sort-based voxel hash; soft grouping is a
grid-hash ball query + label-propagation connected components executed inside
the jitted step; all shapes are static with validity masks so XLA can tile
everything onto the MXU.
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compilation cache (opt out with
    SOFTGROUP_TPU_NO_COMPILE_CACHE=1).  The 7-level U-Net step compiles in
    minutes on TPU; the cache makes every process after the first start in
    seconds."""
    import os
    if os.environ.get("SOFTGROUP_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("SOFTGROUP_TPU_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/softgroup_tpu_xla")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


_enable_compile_cache()
