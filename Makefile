# Convenience targets for the TPU DWI super-resolution framework.

native: native/libmri_io.so

native/libmri_io.so: native/mri_io.cpp
	g++ -O3 -shared -fPIC -std=c++17 $< -o $@ -lz -lpthread

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q --ignore=tests/test_fit_engine.py \
	  --ignore=tests/test_master2d.py --ignore=tests/test_superres3d.py \
	  --ignore=tests/test_inr_erd.py --ignore=tests/test_trainer.py

bench:
	python bench.py

asan-check: native/mri_io.cpp native/test_load.cpp
	g++ -O1 -g -fsanitize=address -std=c++17 native/test_load.cpp \
	  native/mri_io.cpp -lz -lpthread -o /tmp/mri_io_asan && /tmp/mri_io_asan

tsan-check: native/mri_io.cpp native/test_pool_stress.cpp
	g++ -O1 -g -fsanitize=thread -std=c++17 native/test_pool_stress.cpp \
	  native/mri_io.cpp -lz -lpthread -o /tmp/mri_io_tsan && /tmp/mri_io_tsan

.PHONY: native test test-fast bench asan-check tsan-check
