from mapreduce__spark.operators.kernel import run_map_reduce_rdd, run_map_reduce_df

__all__ = ["run_map_reduce_rdd", "run_map_reduce_df"]
