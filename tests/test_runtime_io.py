"""Native artifact writer, weight conversion, checkpoint round-trip."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_native_writer_pngs(tmp_path):
    from PIL import Image

    from guided_attention_tpu.runtime.native import AsyncArtifactWriter

    w = AsyncArtifactWriter(2)
    rng = np.random.default_rng(0)
    for i in range(10):
        w.submit_map(rng.random((16, 16)).astype(np.float32), tmp_path / f"m{i}.png")
    w.submit_image(rng.random((32, 32, 3)), tmp_path / "img.png")
    w.flush()
    for i in range(10):
        im = Image.open(tmp_path / f"m{i}.png")
        im.load()
        assert im.size == (16, 16) and im.mode == "RGB"
    im = Image.open(tmp_path / "img.png")
    im.load()
    assert im.size == (32, 32)
    w.close()


def test_native_writer_viridis_matches_matplotlib(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    from guided_attention_tpu.runtime.native import AsyncArtifactWriter

    w = AsyncArtifactWriter(1)
    if not w.native:
        pytest.skip("no native toolchain")
    x = np.random.default_rng(1).random((16, 16)).astype(np.float32)
    w.submit_map(x, tmp_path / "a.png")
    w.flush()
    plt.imsave(tmp_path / "b.png", (x - x.min()) / (x.max() - x.min()))
    a = np.asarray(Image.open(tmp_path / "a.png").convert("RGB"), int)
    b = np.asarray(Image.open(tmp_path / "b.png").convert("RGB"), int)
    assert np.abs(a - b).max() <= 3  # rounding only
    w.close()


def test_checkpoint_roundtrip(tmp_path):
    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.models.io import is_native_checkpoint, load_params, save_params

    sd = StableDiffusion.create("micro", dtype=jnp.float32, seed=3)
    save_params(tmp_path, sd.params)
    assert is_native_checkpoint(str(tmp_path))
    template = jax.tree_util.tree_map(jnp.zeros_like, sd.params)
    loaded = load_params(tmp_path, template)
    flat_a = jax.tree_util.tree_leaves(sd.params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert all(np.array_equal(a, b) for a, b in zip(flat_a, flat_b))


def test_convert_state_dict_mechanics():
    """Synthetic diffusers-style torch keys -> flax tree: name normalization,
    transposes, full coverage check."""
    from guided_attention_tpu.models.convert import convert_state_dict

    unet_params = {
        "down_blocks_0_resnets_1": {
            "conv1": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros((8,))},
            "norm1": {"scale": jnp.zeros((4,)), "bias": jnp.zeros((4,))},
        },
        "down_blocks_0_attentions_0": {
            "transformer_blocks_0": {
                "attn1": {"to_q": {"kernel": jnp.zeros((8, 8))}},
                "ff": {"net_0_proj": {"kernel": jnp.zeros((8, 64))}},
            }
        },
    }
    clip_params = {
        "token_embedding": {"embedding": jnp.zeros((10, 8))},
        "position_embedding": jnp.zeros((7, 8)),
    }
    rng = np.random.default_rng(0)
    torch_sd = {
        "down_blocks.0.resnets.1.conv1.weight": rng.random((8, 4, 3, 3)).astype(np.float32),
        "down_blocks.0.resnets.1.conv1.bias": rng.random(8).astype(np.float32),
        "down_blocks.0.resnets.1.norm1.weight": rng.random(4).astype(np.float32),
        "down_blocks.0.resnets.1.norm1.bias": rng.random(4).astype(np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight": rng.random(
            (8, 8)
        ).astype(np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight": rng.random(
            (64, 8)
        ).astype(np.float32),
    }
    clip_sd = {
        "text_model.embeddings.token_embedding.weight": rng.random((10, 8)).astype(np.float32),
        "text_model.embeddings.position_embedding.weight": rng.random((7, 8)).astype(np.float32),
        "text_model.embeddings.position_ids": np.arange(7)[None].astype(np.int64),
    }
    out = convert_state_dict(torch_sd, unet_params, "unet")
    out.update(convert_state_dict(clip_sd, clip_params, "text_encoder"))
    # conv kernel transposed OIHW -> HWIO
    np.testing.assert_array_equal(
        np.asarray(out["down_blocks_0_resnets_1"]["conv1"]["kernel"]),
        torch_sd["down_blocks.0.resnets.1.conv1.weight"].transpose(2, 3, 1, 0),
    )
    # linear transposed
    np.testing.assert_array_equal(
        np.asarray(out["down_blocks_0_attentions_0"]["transformer_blocks_0"]["ff"]["net_0_proj"]["kernel"]),
        torch_sd["down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight"].T,
    )
    # embedding not transposed; raw param matched without leaf suffix
    np.testing.assert_array_equal(
        np.asarray(out["token_embedding"]["embedding"]),
        clip_sd["text_model.embeddings.token_embedding.weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(out["position_embedding"]),
        clip_sd["text_model.embeddings.position_embedding.weight"],
    )


def test_convert_reports_missing():
    from guided_attention_tpu.models.convert import convert_state_dict

    flax_params = {"a": {"kernel": jnp.zeros((2, 2))}}
    with pytest.raises(ValueError, match="unfilled"):
        convert_state_dict({}, flax_params, "x")
