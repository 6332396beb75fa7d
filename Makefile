# Native host-runtime library (vk_raytrace_tpu/runtime/native.cpp).
# The Python package also builds this lazily on first import; this target
# exists for explicit/offline builds.
NATIVE_SRC := vk_raytrace_tpu/runtime/native.cpp
NATIVE_LIB := vk_raytrace_tpu/runtime/_native.so

all: $(NATIVE_LIB)

# Portable by default; set NATIVE_ARCH=native for a machine-tuned build
# (the .so is built lazily per machine and is NOT committed).
NATIVE_ARCH ?= x86-64-v2

$(NATIVE_LIB): $(NATIVE_SRC)
	g++ -O3 -march=$(NATIVE_ARCH) -shared -fPIC -o $@ $<

# Default tier: unit + parity tests (< 8 min; pytest.ini excludes -m slow).
test:
	python -m pytest tests/ -x -q

# Full tier: everything, including anchors / goldens / big-scene renders.
# Runbook: run in one process; ~30 min on this host. The conftest clears
# XLA caches between modules (CPU compiler memory pressure).
test-full:
	python -m pytest tests/ -x -q -m ""

bench:
	python bench.py

clean:
	rm -f $(NATIVE_LIB)

.PHONY: all test bench clean
