from synchformer_tpu.data.transforms import (  # noqa: F401
    make_class_grid,
    quantize_offset,
    SyncPipelineConfig,
    prepare_item,
)
