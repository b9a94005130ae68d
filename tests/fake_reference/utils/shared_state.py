"""Shim of reference utils/shared_state.py: the module-global state slots
reference_trace.py sets (config, curHyperParams) and its hooks read
(cur_time_step_iter, updated by the fake pipeline per step)."""

config = None
cur_time_step_iter = 0
curHyperParams = {}


def get_hyperparam_states():
    # reference shared_state.py:29-36: the default grid is ONE state carrying
    # hyperParameterOverrides (thresholds {0: 1.0} etc.)
    return [
        {
            "strict": False,
            "inside_loss_scale": 0.2,
            "outside_loss_scale": 0.2,
            "shrink_factor": 0.15,
            "thresholds": {0: 1.0},
            "use_optimizer": False,
            "recurse_until": 14,
            "recurse_steps": 3,
        }
    ]
