from fastdet.export.stablehlo import export_detector, load_exported

__all__ = ["export_detector", "load_exported"]
