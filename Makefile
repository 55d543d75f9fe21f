# epic_tpu developer targets

.PHONY: test test-fast bench demo dryrun lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_rans.py tests/test_utils.py \
		tests/test_entropy_models.py tests/test_pallas_gdn.py -q

bench:
	python bench.py

demo:
	python -m epic_tpu.cli.demo --tiny --path_image /tmp/demo_test.png \
		--q_levs 0.5 2 10 --save_path /tmp/demo_out

dryrun:
	JAX_PLATFORMS=cpu python __graft_entry__.py 8
