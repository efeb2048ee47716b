from mla_tpu.utils.overwatch import initialize_overwatch
from mla_tpu.utils.seed import set_global_seed
from mla_tpu.utils import tree

__all__ = ["initialize_overwatch", "set_global_seed", "tree"]
