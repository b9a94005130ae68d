"""guided_attention_tpu — a TPU-native JAX/Flax/Pallas framework for
attention-guided Stable Diffusion image generation.

Re-designed from scratch with the capabilities of jackBonadies/Guided-Attention
(reference mounted at /root/reference): generate images while steering *where*
objects appear by capturing every UNet cross-attention map during denoising,
computing differentiable layout losses (bounding boxes, crosshair points,
keywords, plugin losses) over those maps, and gradient-descending the losses
through the UNet into the latent at each step — no fine-tuning.

TPU-first architecture (vs. the reference's monkey-patched torch pipeline):
  * Attention maps are **pure outputs** of the UNet apply function — no global
    AttentionStore mutation (reference: utils/ptp_utils.py:219-270).
  * The whole guided denoising loop — CFG, DDIM, threshold-gated iterative
    refinement (`lax.while_loop`), recursion/re-noise ("time travel") — is one
    scanned XLA graph (reference: pipeline_guided_attention.py:925-1053 is a
    Python loop with per-step autograd graph restarts).
  * Losses are vectorized over all 77 token slots with masks (reference:
    Python 16x16 loops, e.g. utils/helpers.py:215-277).
  * Latent updates are `jax.grad` of a pure loss fn of the maps (reference:
    torch.autograd.grad, pipeline_guided_attention.py:455-470).
  * Multi-seed / multi-prompt batches shard over a `jax.sharding.Mesh`
    (reference: serial Python loop over seeds, run.py:97-98).
"""

__version__ = "0.1.0"

from guided_attention_tpu.annotation import (  # noqa: F401
    AnnotationType,
    Rect,
    parse_prompt,
)
from guided_attention_tpu.config import RunConfig, HyperParams  # noqa: F401
