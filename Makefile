.PHONY: test test-fast test-tpu test-tpu-fast lint bench train dryrun native docs accuracy

native:
	mkdir -p arcadia_microscopy_tools_tpu/_native
	g++ -O3 -shared -fPIC -o arcadia_microscopy_tools_tpu/_native/libamt_host.so native/amt_host.cpp

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

# Compiled-on-chip lane: Pallas kernels through real Mosaic lowering, fused
# frontend, regionprops, one plate batch. Skips cleanly without a TPU.
test-tpu:
	python -m pytest tests_tpu/ -q

# highest-signal on-chip subset (<5 min through the tunnel with a warm
# compilation cache) - run on every build so Mosaic regressions fail tests
# instead of benchmarks (round-4 VERDICT item 7)
test-tpu-fast:
	python -m pytest tests_tpu/ -q -m tpu_smoke

lint:
	python -m compileall -q arcadia_microscopy_tools_tpu tests tests_tpu bench.py __graft_entry__.py
	python tools/lint.py

docs:
	python docs/build.py

accuracy:
	python tools/accuracy_eval.py

bench:
	python bench.py

train:
	python -m arcadia_microscopy_tools_tpu.models.train --steps 1200 --out checkpoints/unet

dryrun:
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
