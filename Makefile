# miniMD-tpu build & test entry points (the reference's Makefile surface)

PY ?= python

.PHONY: all native test test-quick bench clean

all: native

native:
	g++ -O2 -shared -fPIC -o native/libminimd_native.so native/minimd_native.cpp

test:
	$(PY) -m pytest tests/ -x -q

# the reference's `make test` golden sweep (run_tests analog)
test-golden:
	$(PY) scripts/run_tests.py --scope quick

bench:
	$(PY) bench.py

clean:
	rm -f native/libminimd_native.so
	rm -rf minimd_tpu/__pycache__ minimd_tpu/*/__pycache__ tests/__pycache__
