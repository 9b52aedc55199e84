"""Operator library: each module exports QUERIES (name -> (spark, sf_dir) ->
DataFrame) and ORACLES (name -> DuckDB SQL) merged by `..registry`."""
