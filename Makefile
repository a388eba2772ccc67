# Convenience targets.  JAX work must not claim the TPU concurrently:
# the env -u PALLAS_AXON_POOL_IPS prefix detaches CPU-only runs from the
# TPU tunnel so they can run in parallel with device jobs.

PY_CPU := env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python3

.PHONY: test test-fast bench native clean

native:
	python3 -c "from ndsm_tpu.native import build; print(build(force=True))"

test: native
	$(PY_CPU) -m pytest tests/ -q

test-fast: native
	$(PY_CPU) -m pytest tests/ -q -m "not slow"

bench:
	python3 bench.py

clean:
	rm -f ndsm_tpu/native/libndsm_core.so
	find . -name __pycache__ -type d -exec rm -rf {} +
