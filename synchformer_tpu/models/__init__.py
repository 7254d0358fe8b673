from synchformer_tpu.models import layers, pos_emb, aggregators, bridges  # noqa: F401
from synchformer_tpu.models.ast_encoder import ASTEncoder  # noqa: F401
from synchformer_tpu.models.motionformer import MotionFormerEncoder  # noqa: F401
from synchformer_tpu.models.sync_model import (  # noqa: F401
    GlobalTransformer,
    GlobalTransformerWithSyncabilityHead,
    Synchformer,
)
from synchformer_tpu.models.avclip import AVCLIP  # noqa: F401
from synchformer_tpu.models.moco_clip import MultilevelMoCoCLIP  # noqa: F401
from synchformer_tpu.models.sparsesync import SparseSyncTransformer  # noqa: F401
from synchformer_tpu.models.s3d import S3DVisualFeatures  # noqa: F401
from synchformer_tpu.models.resnet_audio import ResNet18AudioFeatures  # noqa: F401
