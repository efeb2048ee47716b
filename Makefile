# MLA-TPU developer entry points

.PHONY: test native bench smoke dryrun clean

test:
	python -m pytest tests/ -q

native:
	g++ -O3 -shared -fPIC -std=c++17 -march=native \
	  mla_tpu/csrc/pointops_host.cpp -o mla_tpu/csrc/libpointops_host.so

bench:
	python bench.py

smoke:
	python scripts/tpu_smoke.py --model mla-small

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	rm -f mla_tpu/csrc/libpointops_host.so
	find . -name __pycache__ -type d -exec rm -rf {} +
