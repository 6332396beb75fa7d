# Native host-runtime library (vk_raytrace_tpu/runtime/native.cpp).
# The Python package also builds this lazily on first import; this target
# exists for explicit/offline builds.
NATIVE_SRC := vk_raytrace_tpu/runtime/native.cpp
NATIVE_LIB := vk_raytrace_tpu/runtime/_native.so

all: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	g++ -O3 -march=native -shared -fPIC -o $@ $<

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f $(NATIVE_LIB)

.PHONY: all test bench clean
