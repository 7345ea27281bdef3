from __future__ import annotations

from kafka_cdc_elasticsearch_pipeline_spark.sources.datagen import ratings_batch


def test_ratings_batch_deterministic(spark):
    a = ratings_batch(spark, 200).collect()
    b = ratings_batch(spark, 200).collect()
    assert a == b


def test_ratings_batch_shape(spark):
    df = ratings_batch(spark, 100)
    assert set(df.columns) == {
        "rating_id",
        "user_id",
        "stars",
        "route_id",
        "channel",
        "message",
        "rating_time",
    }
    rows = df.collect()
    assert all(1 <= r.stars <= 5 for r in rows)
    assert all(1 <= r.user_id <= 20 for r in rows)
    assert any("test" in r.channel for r in rows)
    assert any("test" not in r.channel for r in rows)
    # 750 ms inter-event spacing (docker-compose.yml:145-147)
    assert rows[1].rating_time - rows[0].rating_time == 750
