"""Argoverse-HD class names (parity: `/root/reference/exps/data/argoverse_class.py:5-14`
and the 8-class COCO subset mapping at `sAP/dbcode/dbinfo.py:95-104`)."""

ARGOVERSE_CLASSES = (
    "person",
    "bicycle",
    "car",
    "motorcycle",
    "bus",
    "truck",
    "traffic_light",
    "stop_sign",
)

# Indices of the 8 Argoverse-HD classes inside the 80-class COCO list
# (`sAP/dbcode/dbinfo.py:104` ``avhd_subset``).
COCO_SUBSET = (0, 1, 2, 3, 5, 7, 9, 11)
