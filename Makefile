# Developer entry points (see .claude/skills/verify/SKILL.md for the
# end-to-end drive recipe and docs/DESIGN.md for benchmarks/methodology).

.PHONY: test native bench bench-input smoke-tpu smoke-multihost example

test:            ## full suite on a virtual 8-device CPU mesh
	python -m pytest tests/ -x -q

native:          ## (re)build the C++ host-augment engine
	python -c "from rgb_proprioceptive_pose_estimator_tpu.runtime import native; print(native.build(force=True))"

bench:           ## driver metric: images/sec/chip, one JSON line
	python bench.py

bench-input:     ## host pipeline throughput (native vs numpy)
	python bench_input.py

smoke-tpu:       ## on-device checks (needs a real TPU)
	python scripts/tpu_smoke.py

smoke-multihost: ## 2-process DCN-path smoke on CPU
	python scripts/multihost_smoke.py

example:         ## end-to-end walkthrough (data->train->eval->predict->export)
	python examples/end_to_end.py
