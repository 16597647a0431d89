from .cam import ContextAdapter, zero_init_cam_params  # noqa: F401
from .clip_model import CLIP_VARIANTS, ClipModel, ClipVariant  # noqa: F401
from .factory import ARCHS, create_model, find_clip_weights  # noqa: F401
from .r2plus1d import (  # noqa: F401
    R2Plus1D_34_IG65M_32frames,
    import_ig65m_weights,
)
from .retrieval import (  # noqa: F401
    CLIP,
    MLP,
    JointEmbedding,
    PretrainedCLIP,
    PretrainedCLIP_finaltf,
    PretrainedCLIP_TimeSformer,
    PretrainedCLIP_TimeSformer_finaltf,
)
from .timesformer import (  # noqa: F401
    TimeSformer,
    timesformer_params_from_clip_visual,
)
