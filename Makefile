# Engine developer entry points (the reference shipped a Makefile building
# its Search binary + static lib; ours drives tests, bench, and plan docs).

PY ?= python3

.PHONY: test bench plans search smoke

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

plans:
	$(PY) docs/gen_plans.py

# usage: make search WORD=.cpp DIRS=/root/reference
search:
	$(PY) -m mapreduce__spark.search_cli $(WORD) $(DIRS)

smoke:
	$(PY) -c "from pyspark.sql import SparkSession; import __spark_entry__ as e; \
	          s = SparkSession.builder.master('local[4]').getOrCreate(); \
	          print('entry rows:', e.entry(s).count())"
