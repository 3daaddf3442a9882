.PHONY: test test-fast lint bench train dryrun native docs accuracy

native:
	mkdir -p arcadia_microscopy_tools_tpu/_native
	g++ -O3 -shared -fPIC -o arcadia_microscopy_tools_tpu/_native/libamt_host.so native/amt_host.cpp

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

lint:
	python -m compileall -q arcadia_microscopy_tools_tpu tests bench.py __graft_entry__.py
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
