# Repo-level dev targets.  The native library has its own Makefile under
# audio_processor_tpu/native/.

.PHONY: test smoke durations native

test:
	python -m pytest tests/ -q

# the smoke tier CI runs on every push (tests/conftest.py tiers)
smoke:
	python -m pytest tests/ -q -m "not slow" --smoke-budget=30

# regenerate the measured per-test durations that define the slow tier
# (tests/durations.json; >=3 s => slow).  Delete first so tests that no
# longer exist don't linger.
durations:
	rm -f tests/durations.json
	python -m pytest tests/ -q --update-durations

native:
	$(MAKE) -C audio_processor_tpu/native
