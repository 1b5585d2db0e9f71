# Convenience targets. The env scrubbing (PYTHONPATH=, JAX_PLATFORMS=cpu)
# works around this container's TPU-relay plugin; see tests/conftest.py.

CPU_ENV = env PYTHONPATH= JAX_PLATFORMS=cpu _AET_CLEAN_ENV=1

.PHONY: test native bench bench-baseline samples clean

test:
	$(CPU_ENV) python -m pytest tests/ -x -q

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
