from guided_attention_tpu.parallel.mesh import make_mesh, shard_params, DEFAULT_TP_RULES  # noqa: F401
from guided_attention_tpu.parallel.batch import build_batch_generate  # noqa: F401
