from multimodalfusion_tpu.models import modules  # noqa: F401
from multimodalfusion_tpu.models.genomic import MaxNet  # noqa: F401
from multimodalfusion_tpu.models.amil import PathAMIL, RadioAMIL  # noqa: F401
from multimodalfusion_tpu.models.mm_amil import MMAttentionMIL  # noqa: F401
from multimodalfusion_tpu.models.pretrained_heads import (  # noqa: F401
    MultimodalPretrained,
    UnimodalPretrained,
)
