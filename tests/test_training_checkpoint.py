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


def test_npz_fallback_roundtrips_bfloat16(tmp_path, monkeypatch):
    """bf16 leaves used to save as raw void16 and fail jnp.asarray on
    restore; the fallback now upcasts on save and casts back to the
    template dtype on restore."""
    import sys

    import jax.numpy as jnp
    from audio_processor_tpu.training import checkpoint as ckpt

    state = {
        "w": jnp.ones((3, 2), jnp.bfloat16) * 1.5,
        "step": jnp.asarray(7, jnp.int32),
    }
    # force the npz fallback regardless of orbax availability
    monkeypatch.setitem(sys.modules, "orbax", None)
    monkeypatch.setitem(sys.modules, "orbax.checkpoint", None)
    path = str(tmp_path / "state")
    ckpt.save_train_state(path, state)
    restored = ckpt.restore_train_state(path, state)
    assert restored["w"].dtype == jnp.bfloat16
    assert np.allclose(np.asarray(restored["w"], np.float32), 1.5)
    assert int(restored["step"]) == 7


def test_orphan_recovery_spares_live_owners(tmp_path):
    """Startup orphan recovery must not fail jobs a LIVE process is still
    running (a sibling gunicorn worker, or another host sharing the
    store) — only verifiably dead owners are swept."""
    import os
    import socket

    from audio_processor_tpu.runtime.job_engine import JobEngine, _worker_id
    from audio_processor_tpu.runtime.job_store import SqliteJobStore

    store = SqliteJobStore(str(tmp_path / "jobs2.db"))
    host = socket.gethostname()
    # find a pid that is certainly dead
    dead_pid = 99999
    while True:
        try:
            os.kill(dead_pid, 0)
            dead_pid -= 1
        except ProcessLookupError:
            break
        except PermissionError:
            dead_pid -= 1
    store.create("mine", {"id": "mine", "status": "processing",
                          "worker": _worker_id()})
    store.create("other-host", {"id": "other-host", "status": "processing",
                                "worker": "some-other-host:123"})
    store.create("dead-local", {"id": "dead-local", "status": "processing",
                                "worker": f"{host}:{dead_pid}"})
    store.create("legacy", {"id": "legacy", "status": "pending"})

    engine = JobEngine(max_workers=1, store=store)
    try:
        assert engine.recover_orphans() == 2  # dead-local + legacy
        assert engine.get_job_status("mine")["status"] == "processing"
        assert engine.get_job_status("other-host")["status"] == "processing"
        assert engine.get_job_status("dead-local")["status"] == "failed"
        assert engine.get_job_status("legacy")["status"] == "failed"
    finally:
        engine.shutdown(wait=False)


def test_orphan_recovery_sweeps_stale_foreign_hosts(tmp_path):
    """A container recreate gets a NEW hostname, so the dead owner's jobs
    can never be recovered by 'its own host' — cross-host sweeping keys
    off heartbeat staleness: fresh heartbeat = alive, stale = orphaned."""
    from audio_processor_tpu.runtime.job_engine import JobEngine, _utcnow
    from audio_processor_tpu.runtime.job_store import SqliteJobStore

    store = SqliteJobStore(str(tmp_path / "jobs3.db"))
    store.create("fresh-foreign", {
        "id": "fresh-foreign", "status": "processing",
        "worker": "old-container:1", "heartbeat_at": _utcnow(),
    })
    store.create("stale-foreign", {
        "id": "stale-foreign", "status": "processing",
        "worker": "old-container:1",
        "heartbeat_at": "2020-01-01T00:00:00+00:00",
    })
    engine = JobEngine(max_workers=1, store=store)
    try:
        assert engine.recover_orphans() == 1
        assert engine.get_job_status("fresh-foreign")["status"] == "processing"
        assert engine.get_job_status("stale-foreign")["status"] == "failed"
    finally:
        engine.shutdown(wait=False)


def test_cancelled_pending_job_releases_future(tmp_path):
    """fut.cancel() on a queued job means _run_job never executes — the
    done callback (not _run_job's finally) must drop the Future, or every
    cancelled-while-pending job leaks its closure for the process life."""
    import threading
    import time

    from audio_processor_tpu.runtime.job_engine import JobEngine

    engine = JobEngine(max_workers=1)
    release = threading.Event()
    try:
        engine.create_job("blocker")
        engine.submit("blocker", lambda ctx: release.wait(10) or {"ok": True})
        engine.create_job("queued")
        engine.submit("queued", lambda ctx: {"ok": True})
        out = engine.cancel_job("queued")
        assert out["success"]
        deadline = time.time() + 5
        while time.time() < deadline:
            with engine._futures_lock:
                if "queued" not in engine._futures:
                    break
            time.sleep(0.01)
        with engine._futures_lock:
            assert "queued" not in engine._futures
        assert engine.get_job_status("queued")["status"] == "cancelled"
    finally:
        release.set()
        engine.shutdown(wait=True)
        with engine._futures_lock:
            assert engine._futures == {}
