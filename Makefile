# Common tasks for hnd-ghnd-tpu
.PHONY: test test-slow bench native configs dryrun demo clean

native:
	sh tools/build_native.sh

configs:
	python tools/gen_configs.py

# Fast oracle core on a virtual 8-device CPU mesh (~15 min on 1 core)
test: native
	python -m pytest tests/ -q -m "not slow"

# Heavy e2e/compile tests (runners, split, full parity, 2-process)
test-slow: native
	python -m pytest tests/ -q -m "slow"

bench:
	python bench.py

# multi-chip sharding dry run on 8 virtual CPU devices
dryrun:
	env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
	    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python __graft_entry__.py

# end-to-end validations on the attached chip
demo:
	python tools/e2e_demo.py --steps 400 --distill_steps 4000
	python tools/ext_demo.py

clean:
	rm -rf build __pycache__ .pytest_cache
	find . -name "*.pyc" -delete
