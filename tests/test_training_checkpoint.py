"""Training checkpoint save/restore roundtrip."""
import jax
import numpy as np

from audio_processor_tpu.models.whisper.config import WhisperConfig
from audio_processor_tpu.training import checkpoint as ckpt
from audio_processor_tpu.training import train_step as ts

CFG = WhisperConfig(
    name="ckpt-test", n_mels=80, n_audio_ctx=16, n_audio_state=32,
    n_audio_head=2, n_audio_layer=1, n_vocab=128, n_text_ctx=16,
    n_text_state=32, n_text_head=2, n_text_layer=1,
)


def test_train_state_roundtrip(tmp_path):
    state = ts.init_train_state(CFG, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    ckpt.save_train_state(path, state)

    template = ts.init_train_state(CFG, jax.random.PRNGKey(1))
    restored = ckpt.restore_train_state(path, template)

    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orphan_recovery(tmp_path):
    from audio_processor_tpu.runtime.job_engine import JobEngine
    from audio_processor_tpu.runtime.job_store import SqliteJobStore

    path = str(tmp_path / "jobs.db")
    store = SqliteJobStore(path)
    store.create("dead", {"id": "dead", "status": "processing", "progress": 40})
    store.create("done", {"id": "done", "status": "completed", "progress": 100})

    engine = JobEngine(max_workers=1, store=store)
    try:
        assert engine.recover_orphans() == 1
        assert engine.get_job_status("dead")["status"] == "failed"
        assert engine.get_job_status("done")["status"] == "completed"
    finally:
        engine.shutdown(wait=False)
