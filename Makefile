# Developer entry points. TPU runs go through the axon backend; tests
# force an 8-device virtual CPU mesh (tests/conftest.py).

.PHONY: test bench bench-e2e demo-data native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-e2e:
	python bench.py --mode e2e
	python bench.py --mode e2e_host

demo-data:
	python -c "from faceoff_tpu.data import synthetic; \
	synthetic.generate_dataset('/tmp/faceoff_demo_ds', n_videos=8, n_frames=40, size=256); \
	print('/tmp/faceoff_demo_ds ready')"

native:
	rm -f faceoff_tpu/native/libfaceoff_frame_loader.so
	python -c "from faceoff_tpu import native; assert native.available(); print('native loader built')"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -f faceoff_tpu/native/libfaceoff_frame_loader.so
