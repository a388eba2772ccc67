# Convenience targets.  JAX work must not claim the TPU concurrently:
# the env -u PALLAS_AXON_POOL_IPS prefix detaches CPU-only runs from the
# TPU tunnel so they can run in parallel with device jobs.

PY_CPU := env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python3

.PHONY: test test-fast bench native clean snapshot-check

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

# Pre-snapshot gate (VERDICT r3 item 2): a round must never end with a
# red suite or a broken graft entry.  Run before the final commit of a
# session; exits nonzero on any failure.
snapshot-check: test
	env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
	  XLA_FLAGS=--xla_force_host_platform_device_count=8 python3 -c \
	  "import __graft_entry__ as g; g.dryrun_multichip(8); \
	  fn, args = g.entry(); import jax; jax.block_until_ready(fn(*args)); \
	  print('graft entry OK')"
	@git status --porcelain || true
	@echo "snapshot-check PASSED"
