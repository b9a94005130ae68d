"""Shim of reference utils/ptp_utils.py: AttentionStore + the processor
registration entry point (reference ptp_utils.py:149-175, 219-270) as
reference_trace.py touches them."""

registered = []


class AttentionStore:
    def __init__(self, save_global_store=False):
        self.save_global_store = save_global_store


def register_attention_control(model, controller):
    registered.append((model, controller))
