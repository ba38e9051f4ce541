# Engine developer entry points (the reference shipped a Makefile building
# its Search binary + static lib; ours drives tests, bench, and plan docs).

PY ?= python3

.PHONY: test bench plans search smoke oracle-sf01

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

# Two-scale oracle gate: the FULL DuckDB differential at sf0.1 (10x the
# driver compare scale). Round-close gate — it has caught bugs the
# small scales cannot see (cumsum partition instability, range-frame
# key truncation, the bigram decimal half-tie). ~30 min on local[8].
oracle-sf01:
	$(PY) -m pytest tests/test_oracle_sf01.py -m twoscale -q

plans:
	$(PY) docs/gen_plans.py

# usage: make search WORD=.cpp DIRS=/root/reference
search:
	$(PY) -m mapreduce__spark.search_cli $(WORD) $(DIRS)

smoke:
	$(PY) -c "from pyspark.sql import SparkSession; import __spark_entry__ as e; \
	          s = SparkSession.builder.master('local[4]').getOrCreate(); \
	          print('entry rows:', e.entry(s).count())"
