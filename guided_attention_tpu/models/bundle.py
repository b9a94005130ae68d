"""StableDiffusion model bundle: modules + params + tokenizer.

The functional replacement for the reference's GuidedAttention pipeline
object state (diffusers DiffusionPipeline components, reference
pipeline_guided_attention.py:37-62): modules are pure Flax definitions,
params a plain pytree, so everything jits/shards/donates cleanly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from guided_attention_tpu.models.clip import CLIPTextModel
from guided_attention_tpu.models.configs import StableDiffusionConfig, get_config
from guided_attention_tpu.models.tokenizer import load_tokenizer, pad_ids
from guided_attention_tpu.models.unet import UNet2DCondition
from guided_attention_tpu.models.vae import AutoencoderKL


@dataclasses.dataclass
class StableDiffusion:
    config: StableDiffusionConfig
    unet: UNet2DCondition
    text_encoder: CLIPTextModel
    vae: AutoencoderKL
    tokenizer: Any
    params: Dict[str, Any]

    @classmethod
    def create(
        cls,
        model: str = "sd15",
        dtype: Any = jnp.bfloat16,
        checkpoint_dir: Optional[str] = None,
        seed: int = 0,
    ) -> "StableDiffusion":
        """Build the bundle; random init unless a local checkpoint dir is given."""
        cfg = get_config(model, dtype)
        unet = UNet2DCondition(cfg.unet)
        clip = CLIPTextModel(cfg.clip)
        vae = AutoencoderKL(cfg.vae)
        tokenizer = load_tokenizer(checkpoint_dir)

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        s = cfg.latent_size
        latents = jnp.zeros((1, s, s, cfg.unet.in_channels), dtype)
        ctx = jnp.zeros((1, 77, cfg.unet.cross_attention_dim), dtype)
        ids = jnp.zeros((1, 77), jnp.int32)

        # jit the inits: eager init dispatches thousands of tiny ops
        unet_params = jax.jit(unet.init)(k1, latents, jnp.int32(0), ctx)["params"]
        clip_params = jax.jit(clip.init)(k2, ids)["params"]
        vae_params = jax.jit(lambda k, z: vae.init(k, z, method=AutoencoderKL.decode))(k3, latents)[
            "params"
        ]

        params = {"unet": unet_params, "text_encoder": clip_params, "vae": vae_params}
        if checkpoint_dir is not None:
            from guided_attention_tpu.models.io import is_native_checkpoint, load_params

            if is_native_checkpoint(checkpoint_dir):
                params = load_params(checkpoint_dir, params)
            else:
                from guided_attention_tpu.models.convert import load_component_params

                params = {
                    "unet": load_component_params(checkpoint_dir, "unet", unet_params),
                    "text_encoder": load_component_params(
                        checkpoint_dir, "text_encoder", clip_params
                    ),
                    "vae": load_component_params(checkpoint_dir, "vae", vae_params),
                }
        return cls(cfg, unet, clip, vae, tokenizer, params)

    # --- prompt encoding (reference _encode_prompt, pipeline:64-199) ---
    def tokenize(self, text: str) -> jnp.ndarray:
        return jnp.asarray([pad_ids(self.tokenizer, text)], jnp.int32)

    def encode_prompt(self, prompt: str, negative_prompt: str = ""):
        """Returns embeddings [2, 77, D]: row 0 uncond, row 1 cond."""
        ids = jnp.concatenate([self.tokenize(negative_prompt), self.tokenize(prompt)], axis=0)
        return self.text_encoder.apply({"params": self.params["text_encoder"]}, ids)

    def decode_latents(self, latents_nhwc: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents [B,h,w,4] -> float images [B,H,W,3] in [0,1]."""
        from guided_attention_tpu.models.vae import latents_to_images

        z = latents_nhwc / self.config.vae.scaling_factor
        img = self.vae.apply({"params": self.params["vae"]}, z, method=AutoencoderKL.decode)
        return latents_to_images(img)

    def decode_latents_u8(self, latents_nhwc: jnp.ndarray) -> jnp.ndarray:
        """decode_latents quantized to uint8 on-device — 12x less host
        transfer than fp32 images on remote-attached TPUs."""
        img = self.decode_latents(latents_nhwc)
        return jnp.round(img.astype(jnp.float32) * 255.0).astype(jnp.uint8)
