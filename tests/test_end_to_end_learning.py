"""The strongest correctness test available without pretrained weights:
train a tiny Whisper to map tones -> token sequences, then require the
production decode path (frontend -> encoder -> KV-cache greedy loop) to
recover them exactly.  Pins the consistency of training, teacher-forced
logits, the cached decoder, and EOT termination in one go."""
import numpy as np
import jax
import jax.numpy as jnp

from audio_processor_tpu.models.whisper import decode as dec, model as mdl
from audio_processor_tpu.models.whisper.config import WhisperConfig
from audio_processor_tpu.ops import frontend
from audio_processor_tpu.training import train_step as ts

CFG = WhisperConfig(
    name="overfit", n_mels=80, n_audio_ctx=32, n_audio_state=32,
    n_audio_head=2, n_audio_layer=1, n_vocab=64, n_text_ctx=16,
    n_text_state=32, n_text_head=2, n_text_layer=1,
)


def test_train_then_decode_recovers_sequences():
    st = dec.SpecialTokens.for_config(CFG)
    sr = 16_000
    n_samp = 2 * CFG.n_audio_ctx * frontend.HOP_LENGTH
    freqs = [200, 450, 900, 1800]
    words = [[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]]
    t = np.arange(n_samp) / sr
    mels = np.stack(
        [
            np.asarray(
                frontend.log_mel_spectrogram(
                    jnp.asarray((0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32))
                )
            )
            for f in freqs
        ]
    )

    b = 8
    idx = np.array([0, 1, 2, 3] * 2)
    ti = np.zeros((b, 4), np.int32)
    to = np.zeros((b, 4), np.int32)
    for i, c in enumerate(idx):
        ti[i] = [st.sot] + words[c]
        to[i] = words[c] + [st.eot]
    batch = ts.Batch(
        mel=jnp.asarray(mels[idx]),
        tokens_in=jnp.asarray(ti),
        tokens_out=jnp.asarray(to),
        loss_mask=jnp.ones((b, 4), jnp.float32),
    )

    state = ts.init_train_state(CFG, jax.random.PRNGKey(0), lr=3e-3)
    loss = None
    for _ in range(400):
        state, loss = ts.train_step(state, CFG, batch, lr=3e-3)
    assert float(loss) < 0.01, float(loss)

    audio_states = mdl.encode(state.params, CFG, jnp.asarray(mels))
    res = dec.greedy_decode(
        state.params, CFG, audio_states,
        sot_sequence=(st.sot,), max_new_tokens=5, use_timestamps=False,
    )
    toks = np.asarray(res.tokens)
    for c in range(4):
        assert toks[c, :3].tolist() == words[c], (c, toks[c].tolist())
        assert toks[c, 3] == st.eot  # clean termination
