"""Device compute ops: the replacement for the reference's external
SPIR-V shaders + hala-gfx pipelines (SURVEY.md section 2.9). Everything
here is jit-friendly jax.numpy or Pallas."""
