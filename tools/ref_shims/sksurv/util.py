import numpy as np


class Surv:
    @staticmethod
    def from_arrays(event, time, name_event="event", name_time="time"):
        return np.array(list(zip(np.asarray(event, bool),
                                 np.asarray(time, float))),
                        dtype=[(name_event, bool), (name_time, float)])
