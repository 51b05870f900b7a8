from vitx.nn.vit import (init_params, forward, forward_heads,
                         forward_with_attn, forward_with_rollout)
from vitx.nn.rollout import attention_rollout

__all__ = ["init_params", "forward", "forward_heads",
           "forward_with_attn", "attention_rollout"]
