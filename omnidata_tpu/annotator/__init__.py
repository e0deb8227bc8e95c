from .pipeline import annotate_view, DEVICE_MODALITIES
