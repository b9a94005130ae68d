from guided_attention_tpu.guidance.spec import GuidanceSpec, build_guidance_spec  # noqa: F401
from guided_attention_tpu.guidance.losses import (  # noqa: F401
    TokenStats,
    compute_token_stats,
    compute_loss,
    group_by_subprompt,
    meets_threshold,
)
