"""Shim of reference pipeline_guided_attention.py for the hook dry-run.

``GuidedAttention.__call__`` replays a synthetic trajectory (npz named by
$GA_FAKE_TRAJ) through the EXACT hook call pattern of the real reference's
denoising loop (reference pipeline_guided_attention.py:925-1053):

  per step: per recursion: N fresh guidance evals, each =
    module-global ``aggregate_attention(...)``   (pipeline:338)
    ``GuidedAttention._compute_loss(...)``       (pipeline:973/:548/:577)
  then the gate-path DUPLICATE ``_compute_loss`` with no fresh aggregation
  (pipeline:1003 — must not produce a second record), then one
  ``helpers.log_latent_stats(latent)`` per (step, recursion) (pipeline:1031).

Both call sites resolve through module/class attributes at call time, so the
monkey-patches reference_trace.py installs intercept them exactly as they
would in the real reference.
"""
import os
import types

import numpy as np
import torch

# current-eval pointer, advanced by __call__; read by aggregate_attention
# and _compute_loss below
_cur = {"traj": None, "s": 0, "r": 0, "e": 0}
received = {"latents": None, "kwargs": None}


def aggregate_attention(attention_store, res, from_where, is_cross, select):
    """Returns the current eval's raw aggregated [R,R,K] cross map
    (reference ptp_utils.py:273-289 returns exactly this shape)."""
    t = _cur["traj"]
    raw = t["raw_maps"][_cur["s"], _cur["r"], _cur["e"]]
    return torch.from_numpy(raw.astype(np.float32))


class GuidedAttention:
    @classmethod
    def from_pretrained(cls, model_path, **kw):
        self = cls()
        self.model_path = model_path
        self.unet = types.SimpleNamespace(dtype=torch.float32)
        self.tokenizer = None
        return self

    def to(self, device):
        return self

    @staticmethod
    def _compute_loss(losses_dict, return_losses=False):
        t = _cur["traj"]
        s, r, e = _cur["s"], _cur["r"], _cur["e"]
        loss = float(t["losses"][s, r, e])
        unv = t["unscaled"][s, r, e]
        pairs = [(int(i), float(unv[i])) for i in np.nonzero(unv)[0]]
        # a custom-loss entry carries idx=None (reference pipeline:446-450);
        # the recorder must skip it
        pairs.append((None, 0.5))
        return loss, {}, pairs

    def save_viridis(self, *a, **k):
        pass

    def __call__(self, prompt=None, attention_store=None, latents=None,
                 num_inference_steps=50, **kwargs):
        import utils.shared_state as state
        from utils import helpers

        received["latents"] = None if latents is None else latents.detach().cpu().numpy()
        received["kwargs"] = dict(kwargs, prompt=prompt)
        traj = np.load(os.environ["GA_FAKE_TRAJ"])
        _cur["traj"] = traj
        S = int(num_inference_steps)
        for s in range(S):
            state.cur_time_step_iter = s
            for r in range(int(traj["n_rec"][s])):
                _cur["s"], _cur["r"] = s, r
                E = int(traj["n_evals"][s, r])
                for e in range(E):
                    _cur["e"] = e
                    # fresh eval: aggregate (module attr -> patched hook),
                    # then the loss through the class attr (patched hook)
                    aggregate_attention(
                        attention_store, 16, ("up", "down", "mid"), True, 0
                    )
                    GuidedAttention._compute_loss([], True)
                if E:
                    # gate-path duplicate (pipeline:1003): reuses the prior
                    # aggregation — no aggregate_attention call before it
                    GuidedAttention._compute_loss([], True)
                lat = torch.from_numpy(
                    traj["latents"][s, r].astype(np.float32)
                )
                helpers.log_latent_stats(lat)
        out = types.SimpleNamespace(images=[])
        return out
