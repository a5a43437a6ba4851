"""tpu_pathtracer — a TPU-native spectral path tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CPU path tracer (MatchaChoco010/toy-cpu-pathtracing): hero-wavelength spectral
rendering, PT/NEE/MIS integrators, independent-random and Z-Sobol samplers,
a two-level SAH BVH compiled to flat SoA arrays, 8 material models, 6
light/primitive types, 20 demo scenes and a CLI — plus new TPU-first
capabilities: a differentiable shading pass and multi-chip sharding via
``jax.sharding`` / ``shard_map``.

Design stance (vs. the per-ray, trait-object reference design):
  * everything is SoA: rays, hits, spectra, materials are arrays with a
    leading batch axis; there is no per-ray Python object anywhere.
  * all hot code is jitted; the bounce loop is a ``lax.fori_loop`` wavefront
    with alive masks (reference: recursive per-pixel loop,
    renderer/src/renderer/base_renderer.rs:146-280).
  * samplers are counter-based pure functions of (pixel, sample, dimension)
    (reference keeps mutable sampler state, renderer/src/sampler.rs:13-21).
  * scenes compile to a frozen pytree of device arrays (reference:
    Vec<Box<dyn Primitive>> + Arc<dyn Material>, scene/src/scene.rs:36).
"""

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (measured: the wavefront step's
    ~60-160 s compile drops to seconds on every process after the first —
    works through the tunneled TPU plugin too).  Opt out / relocate with
    TPT_COMPILE_CACHE ("" disables)."""
    import os
    default = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax_compile")
    path = os.environ.get("TPT_COMPILE_CACHE", default)
    if not path:
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

N_SPECTRUM_SAMPLES = 4  # hero wavelengths per path (ref: spectrum/src/sampled_spectrum.rs:11)
LAMBDA_MIN = 360.0      # nm (ref: spectrum/src/spectrum.rs:27-29)
LAMBDA_MAX = 830.0
