"""The medallion pipeline façade — the reference's full capability surface
(put / get / delete, R1–R19) re-expressed as one lazy Spark DAG per method.

Reference flow (etl-job/fhir_import_export.py:416-433 dispatch):

  put    (:451-470): zip → NDJSON → simplify → graph load → denormalize →
                     flat loads ×3 → discovery agg → raw store → snapshot
  get    (:317-357): refresh → filtered export → zip {project}_{ts}_SNAPSHOT.zip
  delete (:362-390): graph + flat ×3 + raw + discovery teardown by project

Spark re-expression (SURVEY §3.1): stages 3–8 are ONE DataFrame DAG per
resource type; the three sinks are the only barriers; the discovery count
reuses the patient DataFrame (no re-query-after-write); the visibility
barrier (:331-332) disappears because batch writes are atomic-on-commit;
delete is a partition drop per store — O(metadata), which is exactly why
``project_id`` is the physical partition key on every table (SURVEY §1.3).

Stores (all parquet, partitioned by project_id):
  graph/vertices, graph/edges   — D2 envelopes: node payloads + exploded relations
  flat/patient|observation|file — D3 denormalized per-entity tables
  raw/resources                 — D4 raw store (original JSON + parsed struct)
  discovery/studies             — D5 per-study aggregate
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aced_etl_pod_spark.plans.authz import can_create, can_read
from aced_etl_pod_spark.plans.storage import drop_partition, upsert_partitions
from aced_etl_pod_spark.session import tune
from aced_etl_pod_spark.sources.archives import unzip_to_dir, zip_dir

# Graph envelope schema (FIXTURES.md §B; inline example at
# fhir_import_export.py:280-285). One unified object struct; per-type fields
# are nullable. Explicit schema — never inferred (SURVEY §1.2).
OBJECT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("resourceType", T.StringType()),
        T.StructField("project_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("identifier", T.ArrayType(T.StringType())),
        T.StructField("identifier_coding", T.ArrayType(T.StringType())),
        T.StructField("subject_id", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("effective_ts", T.TimestampType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField(
            "relations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("dst_id", T.StringType()),
                        T.StructField("dst_name", T.StringType()),
                        T.StructField("label", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("object", OBJECT_SCHEMA),
    ]
)

RESOURCE_TYPES = ("ResearchStudy", "Patient", "Observation", "DocumentReference")
FLAT_INDICES = {"Patient": "patient", "Observation": "observation", "DocumentReference": "file"}


class EtlPodPipeline:
    """put/get/delete over a partitioned parquet warehouse."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = tune(spark)
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # ---- store paths -----------------------------------------------------
    def path(self, store: str) -> str:
        return os.path.join(self.warehouse, store)

    def _read(self, store: str) -> DataFrame | None:
        p = self.path(store)
        try:
            return self.spark.read.parquet(p)
        except Exception:
            return None  # store not created yet (empty-input branch, R9 :235-238)

    # ---- put (import) ----------------------------------------------------
    def put(self, project_id: str, source: str, user: dict | None = None) -> dict:
        """Import one commit: NDJSON dir (or zip) → all stores.

        Mirrors ``_put`` (fhir_import_export.py:451-470); per-commit
        idempotence comes from dynamic partition overwrite on project_id.
        """
        if user is not None and not can_create(user, project_id):
            raise PermissionError(f"user cannot create in {project_id}")
        if source.endswith(".zip"):
            source = unzip_to_dir(source, f"put_{project_id}")

        envelopes = (
            self.spark.read.schema(ENVELOPE_SCHEMA)
            .json(os.path.join(source, "*.ndjson"))
            .withColumn("project_id", F.lit(project_id))
            .cache()  # reused by graph, flat, discovery, raw — one scan
        )

        # Graph load (R7): vertices + exploded edges → partitioned tables.
        vertices = envelopes.select(
            "id", "name", F.to_json("object").alias("object_json"), "project_id"
        )
        edges = envelopes.select(
            F.col("id").alias("src_id"),
            F.explode_outer("relations").alias("rel"),
            "project_id",
        ).select(
            "src_id",
            F.col("rel.dst_id").alias("dst_id"),
            F.col("rel.dst_name").alias("dst_name"),
            F.col("rel.label").alias("label"),
            "project_id",
        ).filter(F.col("dst_id").isNotNull())
        upsert_partitions(self.spark, vertices, self.path("graph/vertices"), "project_id")
        upsert_partitions(self.spark, edges, self.path("graph/edges"), "project_id")

        # Simplify (R6): envelope → flat record per resource type. The
        # object struct carries its own project_id; keep the outer
        # (job-asserted) one and flatten the rest.
        obj_fields = [f.name for f in OBJECT_SCHEMA.fields if f.name != "project_id"]
        flat = envelopes.select(
            "project_id", *[F.col(f"object.{f}").alias(f) for f in obj_fields]
        ).cache()

        # Denormalize patient (R8): roll every related resource type up onto
        # its patient, mirroring the reference's general related-resource
        # denormalization (``denormalize_patient`` fhir_import_export.py:229;
        # README.md:24 DocumentReference→{Patient|Specimen|Observation}).
        patients = flat.filter(F.col("resourceType") == "Patient")
        obs = flat.filter(F.col("resourceType") == "Observation")
        obs_stats = obs.groupBy(F.col("subject_id").alias("obs_patient_id")).agg(
            F.count("*").alias("observation_count"),
            F.round(F.avg("value"), 4).alias("observation_avg"),
        )
        docs = flat.filter(F.col("resourceType") == "DocumentReference")
        doc_stats = docs.groupBy(F.col("subject_id").alias("doc_patient_id")).agg(
            F.count("*").alias("file_count"),
            F.max("id").alias("latest_file_id"),
        )
        patient_denorm = (
            patients.join(obs_stats, patients.id == obs_stats.obs_patient_id, "left")
            .drop("obs_patient_id")
            .join(doc_stats, patients.id == doc_stats.doc_patient_id, "left")
            .drop("doc_patient_id")
            .na.fill({"observation_count": 0, "file_count": 0})
        )

        # Flat loads ×3 (R9) — a type with no input still writes its schema
        # (the reference's /dev/null load, :235-238).
        counts: dict[str, int] = {}
        for rtype, index in FLAT_INDICES.items():
            df = patient_denorm if rtype == "Patient" else flat.filter(
                F.col("resourceType") == rtype
            )
            upsert_partitions(self.spark, df, self.path(f"flat/{index}"), "project_id")
            counts[index] = df.count()

        # Discovery aggregate (R10+R12): count reuses the cached DataFrame —
        # no re-query-after-write.
        # orderBy(id) before limit(1): deterministic pick when a project
        # carries more than one ResearchStudy row (the reference reads the
        # first NDJSON line; file order is its implicit total order).
        study = (
            flat.filter(F.col("resourceType") == "ResearchStudy")
            .orderBy("id")
            .limit(1)
            .collect()
        )
        discovery = self.spark.createDataFrame(
            [
                {
                    "project_id": project_id,
                    "patient_count": counts["patient"],
                    "description": study[0]["description"] if study else None,
                    "identifier_coding": (
                        list(study[0]["identifier_coding"] or []) if study else []
                    ),
                }
            ],
            "project_id string, patient_count long, description string, "
            "identifier_coding array<string>",
        )
        upsert_partitions(self.spark, discovery, self.path("discovery/studies"), "project_id")

        # Raw store (R13): original resources, JSON + parsed struct.
        raw = envelopes.select(
            F.col("object.id").alias("id"),
            F.col("object.resourceType").alias("resource_type"),
            F.to_json("object").alias("resource_json"),
            "project_id",
        )
        upsert_partitions(self.spark, raw, self.path("raw/resources"), "project_id")
        envelopes.unpersist()
        flat.unpersist()  # without this, per-commit put() loops accumulate cached DFs
        return {"project_id": project_id, **counts}

    # ---- get (export) ----------------------------------------------------
    def get(
        self, project_id: str, out_dir: str, user: dict | None = None, ts: str = "00000000-000000"
    ) -> str:
        """Filtered export (R15) + snapshot zip (R16:
        ``{project_id}_{ts}_SNAPSHOT.zip``, fhir_import_export.py:341-342).
        ``ts`` is injectable for determinism (%Y%m%d-%H%M%S in production).
        """
        if user is not None and not can_read(user, project_id):
            raise PermissionError(f"user cannot read {project_id}")
        raw = self._read("raw/resources")
        if raw is None:
            raise FileNotFoundError("raw store is empty")
        export_dir = os.path.join(out_dir, f"{project_id}_export")
        shutil.rmtree(export_dir, ignore_errors=True)
        for rtype in RESOURCE_TYPES:
            (
                raw.filter(
                    (F.col("project_id") == project_id)
                    & (F.col("resource_type") == rtype)
                )
                .select("resource_json")
                .coalesce(1)
                .write.mode("overwrite")
                .text(os.path.join(export_dir, f"{rtype}.ndjson.dir"))
            )
        # flatten the single-part text dirs into {Type}.ndjson files
        for rtype in RESOURCE_TYPES:
            d = os.path.join(export_dir, f"{rtype}.ndjson.dir")
            parts = [f for f in os.listdir(d) if f.startswith("part-")]
            target = os.path.join(export_dir, f"{rtype}.ndjson")
            with open(target, "wb") as out:
                for p in sorted(parts):
                    with open(os.path.join(d, p), "rb") as src:
                        shutil.copyfileobj(src, out)
            shutil.rmtree(d)
        zip_path = os.path.join(out_dir, f"{project_id}_{ts}_SNAPSHOT.zip")
        return zip_dir(export_dir, zip_path)

    # ---- delete (teardown) ----------------------------------------------
    def delete(self, project_id: str, user: dict | None = None) -> dict:
        """Project-wide delete (R17, fhir_import_export.py:372-385): one
        partition drop per store — O(metadata). Create right gates delete,
        as in the reference (:369-370)."""
        if user is not None and not can_create(user, project_id):
            raise PermissionError(f"user cannot delete {project_id}")
        dropped = {}
        for store in (
            "graph/vertices",
            "graph/edges",
            "flat/patient",
            "flat/observation",
            "flat/file",
            "discovery/studies",
            "raw/resources",
        ):
            dropped[store] = drop_partition(self.path(store), "project_id", project_id)
        return dropped

    # ---- queries over the warehouse -------------------------------------
    def patient_count(self, project_id: str) -> int:
        """The reference's own query (R10, :264-274)."""
        flat = self._read("flat/patient")
        if flat is None:
            return 0
        return flat.filter(F.col("project_id") == project_id).count()

    def discovery(self) -> DataFrame | None:
        return self._read("discovery/studies")
