"""Structural tests for diarization checkpoint converters: build synthetic
state dicts with the published module names/shapes and require the
converted trees to run through the forward passes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_processor_tpu.models.diarization import (
    convert,
    embedding as emb_lib,
    segmentation as seg_lib,
)


def _pyannet_state_dict(cfg: seg_lib.SegmentationConfig, rng):
    sd = {}
    sd["sincnet.wav_norm1d.weight"] = rng.normal(1, 0.01, (1,))
    sd["sincnet.wav_norm1d.bias"] = rng.normal(0, 0.01, (1,))
    sd["sincnet.conv1d.0.low_hz_"] = rng.uniform(0, 4000, (cfg.sinc_filters, 1))
    sd["sincnet.conv1d.0.band_hz_"] = rng.uniform(0, 1000, (cfg.sinc_filters, 1))
    sd["sincnet.norm1d.0.weight"] = rng.normal(1, 0.01, (cfg.sinc_filters,))
    sd["sincnet.norm1d.0.bias"] = rng.normal(0, 0.01, (cfg.sinc_filters,))
    c = cfg.conv_channels
    sd["sincnet.conv1d.1.weight"] = rng.normal(0, 0.05, (c, cfg.sinc_filters, 5))
    sd["sincnet.conv1d.1.bias"] = rng.normal(0, 0.01, (c,))
    sd["sincnet.norm1d.1.weight"] = rng.normal(1, 0.01, (c,))
    sd["sincnet.norm1d.1.bias"] = rng.normal(0, 0.01, (c,))
    sd["sincnet.conv1d.2.weight"] = rng.normal(0, 0.05, (c, c, 5))
    sd["sincnet.conv1d.2.bias"] = rng.normal(0, 0.01, (c,))
    sd["sincnet.norm1d.2.weight"] = rng.normal(1, 0.01, (c,))
    sd["sincnet.norm1d.2.bias"] = rng.normal(0, 0.01, (c,))
    d_in = c
    for k in range(cfg.lstm_layers):
        for suf in ("", "_reverse"):
            sd[f"lstm.weight_ih_l{k}{suf}"] = rng.normal(0, 0.05, (4 * cfg.lstm_hidden, d_in))
            sd[f"lstm.weight_hh_l{k}{suf}"] = rng.normal(0, 0.05, (4 * cfg.lstm_hidden, cfg.lstm_hidden))
            sd[f"lstm.bias_ih_l{k}{suf}"] = rng.normal(0, 0.01, (4 * cfg.lstm_hidden,))
            sd[f"lstm.bias_hh_l{k}{suf}"] = rng.normal(0, 0.01, (4 * cfg.lstm_hidden,))
        d_in = 2 * cfg.lstm_hidden
    sd["linear.0.weight"] = rng.normal(0, 0.05, (cfg.linear_dim, 2 * cfg.lstm_hidden))
    sd["linear.0.bias"] = rng.normal(0, 0.01, (cfg.linear_dim,))
    sd["linear.1.weight"] = rng.normal(0, 0.05, (cfg.linear_dim, cfg.linear_dim))
    sd["linear.1.bias"] = rng.normal(0, 0.01, (cfg.linear_dim,))
    sd["classifier.weight"] = rng.normal(0, 0.05, (cfg.num_classes, cfg.linear_dim))
    sd["classifier.bias"] = rng.normal(0, 0.01, (cfg.num_classes,))
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_pyannet_conversion_runs(rng):
    cfg = seg_lib.SegmentationConfig()
    sd = _pyannet_state_dict(cfg, rng)
    params, cfg2 = convert.from_pyannet_state_dict(sd)
    # shapes line up with the random-init tree
    ref = seg_lib.init_params(cfg, jax.random.PRNGKey(0))
    conv_paths = {
        str(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    ref_paths = {
        str(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    assert conv_paths == ref_paths
    audio = jnp.asarray(rng.normal(0, 0.1, (1, cfg.window_samples)), jnp.float32)
    probs = seg_lib.segment_windows(params, cfg2, audio)
    assert probs.shape == (1, cfg.num_frames, 3)


def test_pyannet_conversion_strips_model_prefix(rng):
    cfg = seg_lib.SegmentationConfig()
    sd = {f"model.{k}": v for k, v in _pyannet_state_dict(cfg, rng).items()}
    params, _ = convert.from_pyannet_state_dict(sd)
    assert params["sinc"]["low_hz"].shape == (cfg.sinc_filters,)


def _resnet_state_dict(cfg: emb_lib.EmbeddingConfig, rng, embed_key="seg_1"):
    sd = {}
    c = cfg.base_channels

    def add_bn(name, ch):
        sd[f"{name}.weight"] = rng.normal(1, 0.01, (ch,))
        sd[f"{name}.bias"] = rng.normal(0, 0.01, (ch,))
        sd[f"{name}.running_mean"] = rng.normal(0, 0.01, (ch,))
        sd[f"{name}.running_var"] = rng.uniform(0.9, 1.1, (ch,))

    sd["conv1.weight"] = rng.normal(0, 0.05, (c, 1, 3, 3))
    add_bn("bn1", c)
    cin = c
    for si, n_blocks in enumerate(cfg.blocks, start=1):
        cout = c * (2 ** (si - 1))
        for bi in range(n_blocks):
            base = f"layer{si}.{bi}"
            sd[f"{base}.conv1.weight"] = rng.normal(0, 0.05, (cout, cin, 3, 3))
            add_bn(f"{base}.bn1", cout)
            sd[f"{base}.conv2.weight"] = rng.normal(0, 0.05, (cout, cout, 3, 3))
            add_bn(f"{base}.bn2", cout)
            if cin != cout or (si > 1 and bi == 0):
                sd[f"{base}.downsample.0.weight"] = rng.normal(0, 0.05, (cout, cin, 1, 1))
                add_bn(f"{base}.downsample.1", cout)
            cin = cout
    feat = 2 * cin * (cfg.n_mels // 8)
    sd[f"{embed_key}.weight"] = rng.normal(0, 0.05, (cfg.embed_dim, feat))
    sd[f"{embed_key}.bias"] = rng.normal(0, 0.01, (cfg.embed_dim,))
    return {k: v.astype(np.float32) for k, v in sd.items()}


@pytest.mark.parametrize("embed_key", ["seg_1", "fc"])
def test_resnet_conversion_runs(rng, embed_key):
    cfg = emb_lib.EmbeddingConfig(blocks=(1, 1, 1, 1))
    sd = _resnet_state_dict(cfg, rng, embed_key)
    params, cfg2 = convert.from_resnet_state_dict(sd, cfg)
    audio = jnp.asarray(rng.normal(0, 0.1, (2, cfg.crop_samples)), jnp.float32)
    emb = np.asarray(emb_lib.embed_crops(params, cfg2, audio))
    assert emb.shape == (2, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_diarizer_npz_roundtrip(tmp_path, rng):
    import jax

    from audio_processor_tpu.pipeline.diarize import Diarizer

    d = Diarizer.random_init()
    p = str(tmp_path / "diar.npz")
    convert.save_diarizer_params(p, d.seg_params, d.emb_params)
    d2 = Diarizer.from_npz(p)
    for a, b in zip(jax.tree.leaves(d.seg_params), jax.tree.leaves(d2.seg_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # lstm layer list structure survives (list-of-dicts, not dict of digits)
    assert isinstance(d2.seg_params["lstm"], list)
    assert len(d2.seg_params["lstm"]) == len(d.seg_params["lstm"])
    for a, b in zip(jax.tree.leaves(d.emb_params), jax.tree.leaves(d2.emb_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert isinstance(d2.emb_params["stages"], list)


def test_resnet_conversion_missing_embed_raises(rng):
    cfg = emb_lib.EmbeddingConfig(blocks=(1, 1, 1, 1))
    sd = _resnet_state_dict(cfg, rng)
    del sd["seg_1.weight"], sd["seg_1.bias"]
    with pytest.raises(KeyError):
        convert.from_resnet_state_dict(sd, cfg)
