from dgsqp_tpu.tracks.base import RadiusArclengthTrack
from dgsqp_tpu.tracks.track_lib import (StraightTrack, CurveTrack, ChicaneTrack,
                                        get_track, get_available_tracks)
