from semi_supervised_vos_tpu.data.davis import (  # noqa: F401
    InferenceDataset,
    TrainDataset,
    TripletLossTrainDataset,
    list_image_folder,
)
