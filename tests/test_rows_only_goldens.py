"""Golden pins for the two entries without a SQL oracle (cluster_topdocs:
DBSCAN+PageRank; media_features: binary decode) — both deterministic, so a
regression shows up as a golden mismatch even though the driver gate only
counts their rows."""

import os

import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF), reason="driver testdata not present"
)


def test_cluster_topdocs_golden(ray_session):
    from meresco_lucene_ray.pipelines.entries import q_cluster_topdocs

    out = q_cluster_topdocs(SF).to_pydict()
    assert out == {
        "label": [0],
        "size": [30],
        "representative_doc": [423],
        "top_term": ["data"],
    }


def test_media_features_golden(ray_session):
    from meresco_lucene_ray.pipelines.entries import q_media_features

    df = q_media_features(SF).to_pandas()
    assert len(df) == 80
    assert df["kind"].value_counts().to_dict() == {"image": 40, "audio": 40}
    # 16x16 nearest-neighbour resample of the 8x8 gradient: red mean 0.4985
    img0 = df[(df["kind"] == "image")].iloc[0]
    assert img0["media_id"] == 0 and img0["f0"] == pytest.approx(0.4985)
    assert round(float(df["f0"].sum()), 4) == pytest.approx(34.067, abs=1e-4)
