"""Shape tests for the legacy SparseSync extractors (S3D + ResNet18 audio)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synchformer_tpu.models.resnet_audio import ResNet18AudioFeatures
from synchformer_tpu.models.s3d import S3DVisualFeatures


@pytest.mark.slow
def test_s3d_shapes(rng):
    model = S3DVisualFeatures()
    # 16-frame 64x64 segments keep the test fast; embed dim is still 1024
    x = jnp.asarray(rng.standard_normal((1, 2, 16, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats, global_feats = model.apply(variables, x)
    # temporal downsampling: 16 -> /1 (stem) -> /2 -> /2 = 4 time steps
    assert feats.shape[0:2] == (1, 2)
    assert feats.shape[-1] == 1024
    assert global_feats is None
    assert "batch_stats" in variables  # BN running stats exist


@pytest.mark.slow
def test_s3d_global_repr(rng):
    model = S3DVisualFeatures(agg_time_module="AveragePooling",
                              add_global_repr=True, max_segments=2)
    x = jnp.asarray(rng.standard_normal((1, 2, 16, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats, global_feats = model.apply(variables, x)
    assert feats.shape == (1, 2, 1024)
    assert global_feats.shape == (1, 1024)


def test_resnet18_audio_shapes(rng):
    model = ResNet18AudioFeatures()
    x = jnp.asarray(rng.standard_normal((2, 3, 66, 128)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats, global_feats = model.apply(variables, x)
    # spectrogram (128, 66) -> /32 -> (4, 3) grid; time axis t'=3
    assert feats.shape == (2, 3, 3, 512)
    assert global_feats is None


def test_resnet18_audio_avg_pool_time(rng):
    model = ResNet18AudioFeatures(agg_time_module="AveragePooling")
    x = jnp.asarray(rng.standard_normal((1, 2, 66, 128)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats, _ = model.apply(variables, x)
    assert feats.shape == (1, 2, 512)
