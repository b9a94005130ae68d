"""Shim of the reference's config.RunConfig (reference config.py:6-58):
just the attributes reference_trace.py reads or assigns."""


class RunConfig:
    def __init__(self, meta_prompt=""):
        self.meta_prompt = meta_prompt
        self.prompt = None
        self.token_dict = {}
        self.attention_res = 16
        self.n_inference_steps = 50
        self.guidance_scale = 7.5
        self.max_iter_to_alter = 25
        self.run_standard_sd = False
        self.sd_2_1 = False
        self.diagnostic_level = 0
        self.save_all_maps = False
        self.seeds = []
        self.thresholds = {0: 0.1, 3: 0.8}
        self.scale_factor = 20.0
        self.scale_range = (1.0, 0.5)
        self.smooth_attentions = True
        self.sigma = 0.5
        self.kernel_size = 3
        self.stable = None
