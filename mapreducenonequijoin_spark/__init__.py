"""mapreducenonequijoin_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference repo
``kyunghoj/MapReduceNonEquiJoin`` (a Hadoop MapReduce implementation of
the theta-join partitioning algorithms of Okcan & Riedewald,
"Processing Theta-Joins using MapReduce", SIGMOD 2011 — cited below as
[OR11]) on top of the Spark DataFrame/SQL/Structured-Streaming stack.

NOTE on citations: the reference checkout at /root/reference/ is EMPTY
(verified 2026-08-13, see SURVEY.md §0), so no file:line citations into
it are possible. Operator semantics are instead cited against the
published paper [OR11] and the standard Hadoop MapReduce API semantics
any implementation of it necessarily uses.

Design (SURVEY.md §4.3): every custom operator is a plan-rewrite
function ``DataFrame -> DataFrame`` that composes built-in operators
(derived bucketing keys + equi-joins + residual filters), so Catalyst,
AQE, whole-stage codegen and predicate pushdown apply uniformly, and
every rewrite is shuffle-parallel — the property that makes it correct
at 100 TB, not just at test scale.
"""

__version__ = "0.1.0"
