import pytest

from efg_tpu.utils.events import EventStorage, JSONWriter, get_event_storage
from efg_tpu.utils.history_buffer import HistoryBuffer
from efg_tpu.utils.registry import Registry


def test_registry_roundtrip():
    R = Registry("things")

    @R.register()
    class Foo:
        pass

    R.register(name="bar")(Foo)
    assert R.get("Foo") is Foo
    assert R["bar"] is Foo
    assert "Foo" in R
    with pytest.raises(KeyError):
        R.register(Foo)  # duplicate
    with pytest.raises(KeyError):
        R.get("missing")


def test_history_buffer_stats():
    h = HistoryBuffer()
    for v in [1.0, 2.0, 3.0, 4.0]:
        h.update(v)
    assert h.latest() == 4.0
    assert h.avg(2) == 3.5
    assert h.median(3) == 3.0
    assert h.global_avg() == 2.5


def test_event_storage_and_json_writer(tmp_path):
    with EventStorage(start_iter=0) as storage:
        assert get_event_storage() is storage
        storage.put_scalar("loss", 1.0)
        storage.step()
        storage.put_scalar("loss", 3.0)
        storage.put_scalar("lr", 0.1, smoothing_hint=False)
        w = JSONWriter(str(tmp_path / "metrics.json"), window_size=2)
        w.write()
        w.close()
    import json

    rec = json.loads((tmp_path / "metrics.json").read_text().strip())
    assert rec["iteration"] == 1
    assert rec["loss"] == 3.0  # median of [1, 3] -> index 1
    assert rec["lr"] == 0.1


def test_event_storage_images_and_histograms(tmp_path):
    """put_image / put_histogram queue payloads and the TensorBoard writer
    drains them (reference efg/utils/events.py:279-358, 149-165)."""
    import numpy as np

    from efg_tpu.utils.events import TensorboardWriter

    with EventStorage(start_iter=3) as storage:
        storage.put_scalar("loss", 1.0)
        storage.put_image("vis/pred", np.zeros((8, 8, 3), np.uint8))
        storage.put_histogram("weights/w1", np.arange(100, dtype=np.float32), bins=10)
        assert len(storage._vis_data) == 1
        hp = storage._histograms[0]
        assert hp["tag"] == "weights/w1"
        assert hp["num"] == 100 and hp["global_step"] == 3
        assert len(hp["bucket_counts"]) == 10 and sum(hp["bucket_counts"]) == 100

        w = TensorboardWriter(str(tmp_path / "tb"))
        w.write()
        w.close()
        # queues are drained after a write
        assert storage._vis_data == [] and storage._histograms == []
    assert any((tmp_path / "tb").iterdir())


def test_catalog_uri_resolution():
    """catalog:// and detectron2:// resolve to public zoo URLs (reference
    efg/utils/catalog.py); offline, resolution works and only the fetch
    would raise."""
    from efg_tpu.utils.catalog import Detectron2Handler, ModelCatalog

    url = ModelCatalog.get("ImageNetPretrained/MSRA/R-50")
    assert url.startswith("https://dl.fbaipublicfiles.com/detectron/")
    assert url.endswith("R-50.pkl")

    h = Detectron2Handler()
    assert h.get_supported_prefixes() == ["detectron2://"]

    from efg_tpu.utils.catalog import PathManager

    assert PathManager.exists("catalog://ImageNetPretrained/MSRA/R-101")
    assert not PathManager.exists("catalog://NoSuch/Entry")

    ModelCatalog.register("My/Custom", "custom/weights.pkl")
    assert ModelCatalog.get("My/Custom").endswith("custom/weights.pkl")
