"""Ray Data stages: each public function takes and returns a
``ray.data.Dataset`` (lazy; the streaming executor schedules them)."""
