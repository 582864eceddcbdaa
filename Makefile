# Developer entry points (see CLAUDE.md for environment notes).

.PHONY: test test-fast bench dryrun native corpus-demo

test:               ## full suite — CPU, 8 virtual devices (~14 min)
	python -m pytest tests/ -q

test-fast:          ## skip the slow parity/driver suites (~3 min)
	python -m pytest tests/ -q -k "not training_parity and not drivers and not parallel"

bench:              ## all BASELINE configs on the real chip (one JSON line each)
	python bench.py

dryrun:             ## multi-chip compile+execute check on 8 virtual CPU devices
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

native:             ## rebuild the C++ host runtime
	g++ -O3 -march=native -shared -fPIC geossl_tpu/native/geossl_native.cpp \
	    -o geossl_tpu/native/libgeossl_native.so

corpus-demo:        ## synthesize a 10k-molecule raw tree and build its cache
	python -c "from geossl_tpu.data.synthetic import write_synthetic_molecule3d_raw as w; w('/tmp/m3d_demo', 10000)"
	python -m geossl_tpu.data molecule3d --root /tmp/m3d_demo --subset 10000
