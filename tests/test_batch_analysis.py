"""S6/S7/A2: alert-file read -> group-count -> parquet round trip."""

from __future__ import annotations

import json
import os

from hw_kafka_flink_health_spark.streaming.batch_analysis import run


def test_batch_analysis_roundtrip(spark, tmp_path):
    alerts_dir = tmp_path / "alerts"
    os.makedirs(alerts_dir)
    rows = [
        {"patient_id": "p001", "window_start": 0, "window_end": 60000,
         "avg_hr": 120.0, "min_hr": 110, "max_hr": 130, "alert_type": "tachycardia"},
        {"patient_id": "p001", "window_start": 60000, "window_end": 120000,
         "avg_hr": 118.0, "min_hr": 100, "max_hr": 125, "alert_type": "tachycardia"},
        {"patient_id": "p002", "window_start": 0, "window_end": 60000,
         "avg_hr": 75.0, "min_hr": 70, "max_hr": 80, "alert_type": "normal"},
    ]
    with open(alerts_dir / "part-0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    out_dir = str(tmp_path / "stats")
    run(spark, str(alerts_dir), out_dir)

    back = {
        (r.patient_id, r.alert_type): r
        for r in spark.read.parquet(out_dir).collect()
    }
    assert back[("p001", "tachycardia")].n_alerts == 2
    assert back[("p001", "tachycardia")].mean_avg_hr == 119.0
    assert back[("p001", "tachycardia")].max_hr == 130
    assert back[("p002", "normal")].n_alerts == 1
