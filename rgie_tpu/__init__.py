"""rgie_tpu — TPU-native regressor-guided generative image editing.

A brand-new JAX/Flax/Pallas framework with the capabilities of
`christophgebhardt/regressor-guided-image-editing` (arXiv:2501.12289):
editing photographs so a frozen valence/arousal emotion regressor predicts a
target emotional response while preserving content, via three backends:

1. parametric differentiable photo-filter editing  (``rgie_tpu.ops`` + ``rgie_tpu.engine``)
2. MUNIT GAN style-code editing                    (``rgie_tpu.models.munit``)
3. diffusion inversion + NTO + classifier guidance (``rgie_tpu.diffusion``)

Unlike the PyTorch reference (single-GPU, batch-size-1 Python loops), the
frozen regressor/generator forward+backward passes and the full N-step
per-image optimization loop compile into single XLA programs (``lax.scan``),
and dataset-scale editing is vmapped and sharded across TPU chips.

Layout convention: images are NHWC float arrays (TPU-native), in [0, 1] for
the parametric path and [-1, 1] for the GAN path — the reference's NCHW torch
tensors are never mirrored.
"""

__version__ = "0.1.0"
