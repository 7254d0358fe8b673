from synchformer_tpu.models import layers, pos_emb, aggregators, bridges  # noqa: F401
from synchformer_tpu.models.ast_encoder import ASTEncoder  # noqa: F401
from synchformer_tpu.models.motionformer import MotionFormerEncoder  # noqa: F401
from synchformer_tpu.models.sync_model import (  # noqa: F401
    GlobalTransformer,
    GlobalTransformerWithSyncabilityHead,
    Synchformer,
)
from synchformer_tpu.models.avclip import AVCLIP  # noqa: F401
