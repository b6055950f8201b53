from .attention import (
    attention_reference,
    flash_attention,
    flash_attention_bwd,
    flash_attention_streaming,
    multi_head_attention,
)
from .groupnorm import (
    group_norm_silu,
    group_norm_silu_pallas,
    group_norm_silu_reference,
)
