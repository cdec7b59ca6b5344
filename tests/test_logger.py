"""Logger CSV schema and episode accumulation semantics."""
import os

from plasticinelab_tpu.algorithms.logger import CSV_COLUMNS, Logger


def _info(loss, iou):
    return {"loss": loss, "sdf_loss": loss / 2, "density_loss": loss / 4,
            "contact_loss": loss / 8, "incremental_iou": iou}


def test_logger_csv(tmp_path):
    path = str(tmp_path / "run")
    lg = Logger(path)
    lg.reset()
    lg.step(None, None, 1.0, None, False, _info(2.0, 0.1))
    lg.step(None, None, 0.5, None, True, _info(4.0, 0.3))

    with open(os.path.join(path, "train")) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == ",".join(CSV_COLUMNS)
    row = dict(zip(CSV_COLUMNS, lines[1].split(",")))
    assert float(row["step"]) == 2
    assert float(row["reward"]) == 1.5
    assert float(row["loss"]) == 6.0
    assert float(row["sdf"]) == 3.0
    assert float(row["total_iou"]) == 0.4
    assert float(row["last_iou"]) == 0.3

    # second episode appends
    lg.reset()
    lg.step(None, None, 2.0, None, True, _info(1.0, 0.5))
    with open(os.path.join(path, "train")) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 3
    assert lg.episode == 2
