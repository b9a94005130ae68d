"""Shim of reference utils/helpers.py: only log_latent_stats, which
reference_trace.py wraps (its lls_hook calls the original first)."""

calls = []  # (shape, per_channel) — lets the test assert the original ran


def log_latent_stats(latent, per_channel=False):
    calls.append((tuple(latent.shape), per_channel))
