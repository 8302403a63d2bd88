from types import SimpleNamespace


class MetadataCatalog:
    """evaluator_type inferred from the dataset-name conventions the
    reference configs use (voc_2007_*, coco_*, lvis_*)."""

    @staticmethod
    def get(name):
        if name.startswith("voc"):
            kind = "pascal_voc"
        elif name.startswith("lvis"):
            kind = "lvis"
        elif name.startswith("coco"):
            kind = "coco"
        else:
            kind = "unknown"
        return SimpleNamespace(name=name, evaluator_type=kind)
