# Convenience targets. The env scrubbing (PYTHONPATH=, JAX_PLATFORMS=cpu)
# works around this container's TPU-relay plugin; see tests/conftest.py.

CPU_ENV = env PYTHONPATH= JAX_PLATFORMS=cpu _AET_CLEAN_ENV=1

.PHONY: test test-default test-smoke native bench bench-baseline samples clean

test:            # everything incl. the slow tier (~45 min on this host)
	$(CPU_ENV) python -m pytest tests/ -x -q

test-default:    # slow tier deselected (~30 min)
	$(CPU_ENV) python -m pytest tests/ -x -q -m "not slow"

test-smoke:      # dev-loop tier: core solver/parity/scene/live (~5 min)
	$(CPU_ENV) python -m pytest tests/test_system.py tests/test_parity.py \
	  tests/test_prox.py tests/test_svd.py tests/test_live.py \
	  tests/test_scene.py tests/test_geometry.py -x -q

native:
	$(MAKE) -C admm_elastic_tpu/native

bench:
	python bench.py --steps 10

bench-baseline:
	bash tools/bench_reference.sh 5

samples:
	$(CPU_ENV) python samples/singlenode.py
	$(CPU_ENV) python samples/singletet.py
	$(CPU_ENV) python samples/windyflag.py --steps 30
	$(CPU_ENV) python samples/bunnyexpand.py --steps 30
	$(CPU_ENV) python samples/poordillo.py --steps 30
	$(CPU_ENV) python samples/plinkopony.py --steps 30

clean:
	$(MAKE) -C admm_elastic_tpu/native clean
	find . -name __pycache__ -type d | xargs rm -rf
