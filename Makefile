# Build/test entry points. The native library also auto-builds on first use.
PY ?= python

.PHONY: native test test-tpu bench clean

native:
	$(PY) -m pointcloud_stitching_tpu.native.build

native-server:
	g++ -O2 -std=c++17 -o native/pcs-camera-server \
	    native/camera_server.cc native/snappy.cc -lpthread

cpu-baseline:
	$(PY) scripts/cpu_baseline.py

test: native
	$(PY) -m pytest tests/ -q

test-tpu: native
	PCS_TEST_TPU=1 $(PY) -m pytest tests/ -q

bench: native
	$(PY) bench.py

clean:
	rm -f pointcloud_stitching_tpu/native/*.so native/pcs-camera-server
	find . -name __pycache__ -type d -exec rm -rf {} +
