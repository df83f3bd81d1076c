# Test lanes (see CLAUDE.md). The default lane deselects `slow`
# (executed-reference oracle legs + multi-minute halo trainer
# comparisons) and splits across both host cores.

.PHONY: test test-full native

test:
	python -m pytest tests/ -q -n 2 --dist load

test-full:
	python -m pytest tests/ -q -m "" -n 2 --dist loadfile

native:
	$(MAKE) -C native
