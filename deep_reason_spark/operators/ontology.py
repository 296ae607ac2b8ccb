"""Ontology construction — deterministic dataflow replacement for the
reference's sequential LLM refine stage.

Reference semantics reproduced (SURVEY.md §3.1 stage 2, §7 hard-part (d)):
deep-reason folds token-budget batches of triples through an LLM that
maintains a ``current_ontology`` (``kg_agent/chains.py:202-233``, used at
``kg_agent/agent.py:64-91``) producing ``OntologyStructure`` — entity
classes (``OntologyNode``), relation classes (``OntologyRelation``) and
class-level connections (``OntologyNodesConnection``), schema at
``kg_agent/schemes.py:25-44``. That fold is inherently sequential; the
reference itself offers a parallel map-reduce path for the KG stage
(``kg_agent/agent.py:118-124``), which is our precedent for replacing the
fold with an order-free aggregation that yields the same output contract:

- entity classes    = distinct types of linked entities (typed by the
  alias dictionary; unlinked mentions class 'entity');
- relation classes  = distinct predicates, densely numbered in predicate
  sort order (deterministic, no fold state);
- connections       = distinct (subject class, relation, object class)
  triples actually observed.

All three tables are partial-aggregation-friendly groupBys — no driver
loop, no sequential state, identical result at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from deep_reason_spark.functions.names import longest_name

from deep_reason_spark.functions.broadcast import broadcast_if_small


# the dense relation numbering below is a single-task global sort — correct
# ONLY while the distinct-predicate registry is vocabulary-scale. The bound
# is enforced at materialization time (assert_true inside the numbering
# expression: zero extra jobs, hard failure instead of a silent straggler).
MAX_RELATIONS = 1 << 20


def build_ontology(
    linked_triples: DataFrame,
    entity_types: DataFrame,
    max_relations: int = MAX_RELATIONS,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """linked triples + (entity_id, type) → (nodes, relations, connections).

    Output columns mirror kg_agent/schemes.py:25-44:
    - ontology_nodes:       node_id string, entity string
    - ontology_relations:   relation_id int, relation_name string
    - ontology_connections: node_id_1 string, node_id_2 string, relation_id int
    """
    typed = attach_types(linked_triples, entity_types)

    classes = (
        typed.select(F.col("subject_type").alias("entity"))
        .union(typed.select(F.col("object_type").alias("entity")))
        .distinct()
    )
    ontology_nodes = classes.select(
        F.concat(F.lit("class:"), F.col("entity")).alias("node_id"), "entity"
    )

    w = Window.orderBy("relation_name")
    rn = F.row_number().over(w)
    guarded = F.when(
        F.assert_true(
            rn <= F.lit(max_relations),
            F.lit(f"ontology relation registry exceeded {max_relations} "
                  "distinct predicates — no longer vocabulary-scale; the "
                  "single-task dense numbering in build_ontology must be "
                  "replaced before running at this cardinality"),
        ).isNull(),
        rn,
    ).otherwise(rn)
    ontology_relations = (
        typed.select(F.col("predicate").alias("relation_name")).distinct()
        .withColumn("relation_id", guarded.cast("int"))
        .select("relation_id", "relation_name")
    )

    ontology_connections = (
        typed.select(
            F.concat(F.lit("class:"), F.col("subject_type")).alias("node_id_1"),
            F.concat(F.lit("class:"), F.col("object_type")).alias("node_id_2"),
            F.col("predicate").alias("relation_name"),
        )
        .distinct()
        .join(F.broadcast(ontology_relations), "relation_name")
        .select("node_id_1", "node_id_2", "relation_id")
    )
    return ontology_nodes, ontology_relations, ontology_connections


def attach_types(linked_triples: DataFrame, entity_types: DataFrame) -> DataFrame:
    """Add subject_type/object_type via byte-gated broadcast of the
    (entity_id, type) dictionary; unknown entities get class 'entity' (the
    reference's LLM would invent a class; we use the stable default).

    The type map is alias-dictionary-derived — dictionary-scale by current
    design — but ungated it was a latent executor-OOM if a deployment feeds
    an entity-scale map (VERDICT r4 task 3). Gated ONCE on the raw frame
    (one memoized estimate job; engine callers pass a localCheckpointed
    map): the hint survives the two projections below, so both joins stay
    single-pass broadcast hash joins while the map fits."""
    entity_types = broadcast_if_small(entity_types)
    st = entity_types.select(
        F.col("entity_id").alias("subject_id"), F.col("type").alias("subject_type")
    )
    ot = entity_types.select(
        F.col("entity_id").alias("object_id"), F.col("type").alias("object_type")
    )
    return (
        linked_triples
        .join(st, "subject_id", "left")
        .join(ot, "object_id", "left")
        .withColumn("subject_type", F.coalesce("subject_type", F.lit("entity")))
        .withColumn("object_type", F.coalesce("object_type", F.lit("entity")))
    )


def build_kg_structure(
    canonical_triples: DataFrame,
    entity_types: DataFrame,
    ontology_relations: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Instance-level KG in the reference's KgStructure shape
    (kg_agent/schemes.py:48-61):

    - kg_nodes:    node_id, entity_name, ontology_node_id (instance-of FK)
    - kg_triplets: kg_subject_id, kg_object_id, ontology_nodes_connection_id
      (the connection id is the deterministic composite
      class1|relation_id|class2, so it joins back to ontology_connections)
    """
    typed = attach_types(canonical_triples, entity_types)

    kg_nodes = (
        typed.select(F.col("src").alias("node_id"),
                     F.col("subject_canonical").alias("entity_name"),
                     F.col("subject_type").alias("t"))
        .union(typed.select(F.col("dst"), F.col("object_canonical"),
                            F.col("object_type")))
        .groupBy("node_id")
        .agg(
            longest_name("entity_name").alias("entity_name"),
            F.min("t").alias("t"),
        )
        .select("node_id", "entity_name",
                F.concat(F.lit("class:"), F.col("t")).alias("ontology_node_id"))
    )

    kg_triplets = (
        typed
        .join(F.broadcast(ontology_relations),
              typed["predicate"] == F.col("relation_name"))
        .select(
            F.col("src").alias("kg_subject_id"),
            F.col("dst").alias("kg_object_id"),
            F.concat_ws(
                "|",
                F.concat(F.lit("class:"), F.col("subject_type")),
                F.col("relation_id").cast("string"),
                F.concat(F.lit("class:"), F.col("object_type")),
            ).alias("ontology_nodes_connection_id"),
        )
        .distinct()
    )
    return kg_nodes, kg_triplets
