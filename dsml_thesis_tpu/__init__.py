"""dsml_thesis_tpu — TPU-native latent-diffusion face synthesis framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the
GiannisPikoulis/dsml-thesis reference (AffectNet emotion-conditioned LDM for
face reenactment + MEAD audio/emotion-conditioned LDM for talking-face video),
designed TPU-first: NHWC layouts, bf16 MXU compute, lax.scan samplers, pjit
data-parallel training over an ICI mesh, Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"
