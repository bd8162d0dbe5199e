import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwc_dataframe_validator_spark.sources.tables import local_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = local_session("dwc-validator-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def occurrence_df(spark):
    """README-style occurrence data exercising every failure mode."""
    data = [
        ("1", "Ursus arctos", "51.0", "-1.1", "2023-01-01", "John Smith", "WGS84", "HumanObservation"),
        ("2", "Ursus arctos", "52.0", "bad", "2023-01-02", "Jane Doe", "WGS84", "HumanObservation"),
        ("3", "Ursus arctos", "91.0", "-1.3", "2023-01-03", None, "GIRAFFE", "NONSENSE"),
        ("4", None, None, None, "2023-01-04", "Jo", "WGS84", "humanobservation"),
        ("5", "Vulpes vulpes", "50.0", "-1.4", "bad-date", "Al", "EPSG:32650", "Observation"),
    ]
    cols = ["occurrenceID", "scientificName", "decimalLatitude", "decimalLongitude",
            "eventDate", "recordedBy", "geodeticDatum", "basisOfRecord"]
    return spark.createDataFrame(data, cols)
