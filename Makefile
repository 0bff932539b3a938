# bgn_tpu build targets (analog of the reference Makefile:1-12)

.PHONY: all native test bench demo clean

all: native

native: csrc/libbgnhost.so

csrc/libbgnhost.so: csrc/hostmath_accel.cpp
	g++ -O2 -fPIC -shared -std=c++17 -o $@ $<

test:
	python -m pytest tests/ -q

# One pytest process per file: immune to the XLA:CPU long-process
# compiler instability (see tests/conftest.py).
test-isolated:
	for f in tests/test_*.py; do \
	  python -m pytest $$f -q || exit 1; \
	done

bench:
	python bench.py

demo:
	python -m bgn_tpu.cli

clean:
	rm -f csrc/libbgnhost.so
