"""Schema catalog: the expected-column authority per sheet.

The reference learns expected columns from MySQL INFORMATION_SCHEMA at
runtime (nci-seronet-data-validator.py:145-150) keyed through each sheet's
``Check_Tables``. Without a database this static catalog (derived from the
rulebook + FIXTURES.md) stands in; ``sources/jdbc.read_expected_columns``
supplies the dynamic variant when a JDBC URL is configured.
"""

from __future__ import annotations

EXPECTED_COLUMNS: dict[str, list[str]] = {
    "prior_clinical_test.csv": [
        "Research_Participant_ID", "SARS_CoV_2_PCR_Test_Result",
        "SARS_CoV_2_PCR_Test_Result_Provenance",
        "Date_of_SARS_CoV_2_PCR_sample_collection",
        "CMV_Test_Result", "CMV_Test_Result_Provenance", "Date_of_CMV_Test",
        "EBV_Test_Result", "EBV_Test_Result_Provenance", "Date_of_EBV_Test",
        "HepB_sAg_Test_Result", "HepB_sAg_Test_Result_Provenance",
        "Date_of_HepB_sAg_Test",
        "Seasonal_Coronavirus_Serology_Result",
        "Seasonal_Coronavirus_Molecular_Result",
        "Current_HIV_infection", "Duration_of_HIV_infection",
        "Duration_of_HIV_infection_unit",
        "On_HAART_Therapy", "Duration_of_HAART_Therapy",
        "Duration_of_HAART_Therapy_unit",
    ],
    "demographic.csv": [
        "Research_Participant_ID", "Age", "Race", "Ethnicity", "Gender",
        "Is_Symptomatic", "Date_of_Symptom_Onset", "Symptoms_Resolved",
        "Date_of_Symptom_Resolution", "Covid_Disease_Severity",
        "Diabetes_Mellitus", "Hypertension", "Severe_Obesity",
        "Cardiovascular_Disease", "Chronic_Renal_Disease",
        "Chronic_Liver_Disease", "Chronic_Lung_Disease",
        "Immunosuppressive_conditions", "Autoimmune_condition",
        "Inflammatory_Disease", "Other_Comorbidity",
    ],
    "biospecimen.csv": [
        "Research_Participant_ID", "Biospecimen_ID", "Biospecimen_Group",
        "Biospecimen_Type", "Initial_Volume_of_Biospecimen",
        "Biospecimen_Collection_Company_Clinic",
        "Biospecimen_Processing_Initials", "Collection_Tube_Type",
        "Collection_Tube_Type_Lot_Number",
        "Collection_Tube_Type_Expiration_Date",
        "Date_of_Sample_Collection", "Time_of_Sample_Collection",
        "Storage_Time_at_2_8", "Storage_Start_Time_at_2_8",
        "Storage_End_Time_at_2_8", "Storage_Start_Time_at_2_8_Initials",
        "Storage_End_Time_at_2_8_Initials",
        "Final_Concentration_of_Biospecimen",
        "Live_Cells_Hemocytometer_Count", "Total_Cells_Hemocytometer_Count",
        "Viability_Hemocytometer_Count", "Live_Cells_Automated_Count",
        "Total_Cells_Automated_Count", "Viability_Automated_Count",
        "Centrifugation_Time", "RT_Serum_Clotting_Time",
        "Storage_Start_Time_80_LN2_storage",
    ],
    "aliquot.csv": ["Aliquot_ID", "Biospecimen_ID", "Aliquot_Volume",
                    "Aliquot_Concentration", "Aliquot_Tube_Type",
                    "Aliquot_Tube_Type_Lot_Number",
                    "Aliquot_Tube_Type_Expiration_Date"],
    "equipment.csv": ["Equipment_ID", "Biospecimen_ID", "Equipment_Type",
                      "Equipment_Calibration_Due_Date"],
    "reagent.csv": ["Reagent_Name", "Biospecimen_ID", "Reagent_Lot_Number",
                    "Reagent_Catalog_Number", "Reagent_Expiration_Date"],
    "consumable.csv": ["Consumable_Name", "Biospecimen_ID",
                       "Consumable_Lot_Number", "Consumable_Catalog_Number",
                       "Consumable_Expiration_Date"],
    "assay.csv": [
        "Assay_ID", "Assay_Name", "Technology_Type", "Assay_Manufacturer",
        "Target_Organism", "EUA_Status", "Assay_Multiplicity",
        "Assay_Control_Type", "Measurand_Antibody_Type", "Assay_Result_Type",
        "Peformance_Statistics_Source", "Assay_Antigen_Source",
        "Target_biospecimen_is_Serum", "Target_biospecimen_is_Plasma",
        "Postive_Control", "Negative_Control", "Calibration_Type",
        "Calibrator_High_or_Positive", "Calibrator_Low_or_Negative",
        "Assay_Result_Unit", "Cut_Off_Unit", "Assay_Target",
        "Positive_Cut_Off_Threshold", "Negative_Cut_Off_Ceiling",
        "Assay_Target_Sub_Region", "N_true_positive", "N_true_negative",
        "N_false_positive", "N_false_negative",
    ],
    "assay_target.csv": ["Assay_ID", "Assay_Target", "Assay_Antigen_Source",
                         "Assay_Target_Sub_Region"],
    "confirmatory_clinical_test.csv": [
        "Research_Participant_ID", "Assay_ID", "Assay_Target",
        "Instrument_ID", "Test_Operator_Initials", "Assay_Kit_Lot_Number",
        "Date_of_Test", "Time_of_Test", "Assay_Target_Sub_Region",
        "Measurand_Antibody", "Interpretation", "Assay_Replicate",
        "Sample_Dilution", "Derived_Result", "Derived_Result_Units",
        "Raw_Result", "Raw_Result_Units", "Positive_Control_Reading",
        "Negative_Control_Reading", "Sample_Type",
    ],
}


def static_expected_columns() -> dict[str, list[str]]:
    return dict(EXPECTED_COLUMNS)
