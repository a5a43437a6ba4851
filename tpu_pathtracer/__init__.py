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

N_SPECTRUM_SAMPLES = 4  # hero wavelengths per path (ref: spectrum/src/sampled_spectrum.rs:11)
LAMBDA_MIN = 360.0      # nm (ref: spectrum/src/spectrum.rs:27-29)
LAMBDA_MAX = 830.0
