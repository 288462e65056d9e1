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

asan-check: native/mri_io.cpp
	g++ -O1 -g -fsanitize=address -std=c++17 -DASAN_SMOKE native/mri_io.cpp \
	  -lz -lpthread -shared -fPIC -o /tmp/libmri_io_asan.so && echo "ASan build OK"

.PHONY: native test test-fast bench asan-check
