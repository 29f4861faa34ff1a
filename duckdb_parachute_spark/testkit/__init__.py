from duckdb_parachute_spark.testkit.compare import OracleSession, compare_frames, run_compare

__all__ = ["OracleSession", "compare_frames", "run_compare"]
