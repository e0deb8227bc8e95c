from .pipeline import annotate_view, annotate_views, DEVICE_MODALITIES
from .distributed import annotate_views_sharded, make_annotate_mesh
