from .profiler import Profiler
from .video import make_video
