"""Class-name tables for the per-class IoU report (reference scores() —
SURVEY.md §2 eval-metrics row returns the class-wise IoU table)."""

from cyclegan_tpu.data.datasets import CLASS_NAMES, DATASET_SPECS, class_names


def test_known_tables_match_dataset_specs():
    for name in ("voc2012", "cityscapes", "acdc"):
        num_classes = DATASET_SPECS[name][0]
        names = class_names(name, num_classes)
        assert names == CLASS_NAMES[name]
        assert len(names) == num_classes
        assert len(set(names)) == num_classes  # no duplicate labels


def test_voc_order_is_devkit_order():
    names = class_names("voc2012", 21)
    assert names[0] == "background"
    assert names[1] == "aeroplane"
    assert names[20] == "tvmonitor"


def test_synthetic_and_unknown_fall_back_to_indices():
    assert class_names("synthetic", 21) == tuple(
        f"class_{i}" for i in range(21))
    assert class_names("does_not_exist", 3) == ("class_0", "class_1", "class_2")


def test_mismatched_count_falls_back_rather_than_mislabel():
    # Asking for a different class count than the table has must not
    # mislabel confusion-matrix rows.
    assert class_names("voc2012", 4) == tuple(f"class_{i}" for i in range(4))
