"""Pipeline round-trip tests (SURVEY §5.5, mirroring reference R1–R19):
put two projects → stores populated; export → re-read equals original
projection; delete project A → B untouched (anti-join invariant); authz
gates each method; zip ingestion path works."""

from __future__ import annotations

import json
import os
import zipfile

import pytest
from pyspark.sql import functions as F

from aced_etl_pod_spark.plans.authz import can_create, can_read
from aced_etl_pod_spark.plans.pipeline import EtlPodPipeline
from aced_etl_pod_spark.sources.archives import zip_dir

# Reference-shaped profile (_can_create/_can_read fhir_import_export.py:62-145):
# program paths in `resources`, grant under the PROJECT-level authz path.
USER_FULL = {
    "resources": ["/programs/prog", "/programs/prog/projects"],
    "authz": {
        "/programs/prog/projects/alpha": [
            {"method": "create", "service": "*"},
            {"method": "read-storage", "service": "*"},
        ]
    },
}
# A grant on the program-wide projects *collection* (no project-level path)
# must NOT authorize individual projects — the reference requires the
# project-scoped authz entry.
USER_PROGRAM_WIDE = {
    "resources": ["/programs/prog", "/programs/prog/projects"],
    "authz": {
        "/programs/prog/projects": [
            {"method": "create", "service": "*"},
            {"method": "read-storage", "service": "*"},
        ]
    },
}
USER_NONE = {"resources": [], "authz": {}}


@pytest.fixture()
def pipeline(spark, tmp_path):
    return EtlPodPipeline(spark, str(tmp_path / "warehouse"))


def test_put_populates_all_stores(pipeline, fhir_fixture):
    out = pipeline.put("prog-alpha", fhir_fixture["prog-alpha"])
    assert out == {"project_id": "prog-alpha", "patient": 4, "observation": 8, "file": 4}
    v = pipeline.spark.read.parquet(pipeline.path("graph/vertices"))
    e = pipeline.spark.read.parquet(pipeline.path("graph/edges"))
    assert v.count() == 1 + 4 + 8 + 4
    assert e.count() == 4 + 8 + 4  # every non-study resource has one relation
    assert pipeline.patient_count("prog-alpha") == 4
    disc = pipeline.discovery().filter(F.col("project_id") == "prog-alpha").first()
    assert disc["patient_count"] == 4
    assert "prog-alpha" in disc["description"]


def test_denormalized_patient_has_observation_stats(pipeline, fhir_fixture):
    pipeline.put("prog-alpha", fhir_fixture["prog-alpha"])
    pat = pipeline.spark.read.parquet(pipeline.path("flat/patient"))
    row = pat.filter(F.col("id") == "patient-prog-alpha-2").first()
    # patient 2 has observations valued 20.0 and 21.0
    assert row["observation_count"] == 2
    assert row["observation_avg"] == pytest.approx(20.5)
    # DocumentReference rollup (README.md:24: files associate with a
    # patient): each fixture patient carries exactly one document
    assert row["file_count"] == 1
    assert row["latest_file_id"] == "doc-prog-alpha-2"


def test_discovery_study_pick_is_deterministic(pipeline, fhir_fixture):
    """A project with >1 ResearchStudy row must pick the min-id study for
    its discovery record, independent of file or partition order."""
    src = fhir_fixture["prog-alpha"]
    extra = {
        "id": "study-0-first",
        "name": "research_study",
        "relations": [],
        "object": {
            "id": "study-0-first",
            "resourceType": "ResearchStudy",
            "project_id": "prog-alpha",
            "status": "active",
            "description": "the lexicographically-first study",
            "identifier": [],
            "identifier_coding": [],
        },
    }
    with open(os.path.join(src, "ResearchStudy.ndjson"), "a") as f:
        f.write(json.dumps(extra) + "\n")
    pipeline.put("prog-alpha", src)
    disc = pipeline.discovery().filter(F.col("project_id") == "prog-alpha").first()
    assert disc["description"] == "the lexicographically-first study"


def test_put_is_idempotent(pipeline, fhir_fixture):
    pipeline.put("prog-alpha", fhir_fixture["prog-alpha"])
    pipeline.put("prog-alpha", fhir_fixture["prog-alpha"])  # re-run same commit
    assert pipeline.patient_count("prog-alpha") == 4  # no duplication


def test_export_roundtrip(pipeline, fhir_fixture, tmp_path):
    pipeline.put("prog-alpha", fhir_fixture["prog-alpha"])
    zip_path = pipeline.get("prog-alpha", str(tmp_path / "out"), ts="20240101-000000")
    assert zip_path.endswith("prog-alpha_20240101-000000_SNAPSHOT.zip")
    with zipfile.ZipFile(zip_path) as zf:
        names = set(zf.namelist())
        assert {"ResearchStudy.ndjson", "Patient.ndjson", "Observation.ndjson",
                "DocumentReference.ndjson"} <= names
        patients = [
            json.loads(line)
            for line in zf.read("Patient.ndjson").decode().splitlines()
        ]
    exported_ids = {p["id"] for p in patients}
    original_ids = {f"patient-prog-alpha-{i}" for i in range(4)}
    assert exported_ids == original_ids


def test_delete_isolates_projects(pipeline, fhir_fixture):
    pipeline.put("prog-alpha", fhir_fixture["prog-alpha"])
    pipeline.put("prog-beta", fhir_fixture["prog-beta"])
    assert pipeline.patient_count("prog-beta") == 3
    pipeline.delete("prog-alpha")
    assert pipeline.patient_count("prog-alpha") == 0
    assert pipeline.patient_count("prog-beta") == 3  # B unchanged
    raw = pipeline.spark.read.parquet(pipeline.path("raw/resources"))
    assert raw.filter(F.col("project_id") == "prog-alpha").count() == 0


def test_zip_ingestion(pipeline, fhir_fixture, tmp_path):
    """R5: zip-of-NDJSON → same result as the directory path."""
    zip_path = zip_dir(fhir_fixture["prog-alpha"], str(tmp_path / "commit.zip"))
    out = pipeline.put("prog-alpha", zip_path)
    assert out["patient"] == 4


def test_authz_gates_methods(pipeline, fhir_fixture, tmp_path):
    assert can_create(USER_FULL, "prog-alpha") and can_read(USER_FULL, "prog-alpha")
    assert not can_create(USER_NONE, "prog-alpha")
    # project-scoped grant does not leak to sibling projects in the program
    assert not can_create(USER_FULL, "prog-beta")
    assert not can_read(USER_FULL, "prog-beta")
    # program-collection grant does not fan out to every project (the
    # privilege-escalation shape the reference rejects)
    assert not can_create(USER_PROGRAM_WIDE, "prog-alpha")
    assert not can_read(USER_PROGRAM_WIDE, "prog-alpha")
    # both program resource paths are required
    missing_program = {
        "resources": ["/programs/prog/projects"],
        "authz": USER_FULL["authz"],
    }
    assert not can_create(missing_program, "prog-alpha")
    with pytest.raises(PermissionError):
        pipeline.put("prog-alpha", fhir_fixture["prog-alpha"], user=USER_NONE)
    pipeline.put("prog-alpha", fhir_fixture["prog-alpha"], user=USER_FULL)
    with pytest.raises(PermissionError):
        pipeline.get("prog-alpha", str(tmp_path / "o"), user=USER_NONE)
    with pytest.raises(PermissionError):
        pipeline.delete("prog-alpha", user=USER_NONE)


def test_empty_input_type_still_loads(pipeline, fhir_fixture):
    """The reference's /dev/null branch (R9 :235-238): a project with no
    DocumentReference file still loads cleanly elsewhere."""
    os.remove(os.path.join(fhir_fixture["prog-beta"], "DocumentReference.ndjson"))
    out = pipeline.put("prog-beta", fhir_fixture["prog-beta"])
    assert out["patient"] == 3 and out["file"] == 0


def test_job_protocol_dispatch(spark, fhir_fixture, tmp_path):
    """R1/R18/R19: INPUT_DATA-shaped blob → put (with chained snapshot) →
    get → delete, with the [out] marshalling."""
    from aced_etl_pod_spark.plans.job import format_out, run_job

    wh = str(tmp_path / "wh")
    blob = {
        "project_id": "prog-alpha",
        "method": "put",
        "push": {"commits": [{"meta_path": fhir_fixture["prog-alpha"],
                              "commit_id": "c1", "object_id": "o1"}]},
    }
    out = run_job(spark, blob, wh, export_dir=str(tmp_path / "exp"))
    assert out["commits"][0]["patient"] == 4
    assert out["snapshot"].endswith("_SNAPSHOT.zip")
    assert format_out(out).startswith("[out] {")

    got = run_job(spark, {"project_id": "prog-alpha", "method": "get"}, wh)
    assert got["snapshot"].endswith("_SNAPSHOT.zip")

    del_out = run_job(spark, {"project_id": "prog-alpha", "method": "delete"}, wh)
    assert del_out["dropped"]["flat/patient"] is True

    import pytest as _pytest
    with _pytest.raises(ValueError):
        run_job(spark, {"project_id": "prog-alpha", "method": "bogus"}, wh)
