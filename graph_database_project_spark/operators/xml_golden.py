"""Golden-constant DuckDB oracles for the sf-invariant ``xml_*`` queries.

The xml_* queries read the reference's STATIC 3-document corpus
(`boeing_service_bulletin_{1,2,3}.xml`) and take no input from sf_dir, so
their exact outputs are fixed. Each oracle below pins those hand-verified
values as a constant VALUES table — a true value check (any behavior change
in shred/traverse/store hash-mismatches at the driver), the same goldens
tests/test_graph_xml.py asserts, now enforced end-to-end. Regenerate after
an INTENDED semantic change with scripts/gen_xml_golden.py.

``xml_subtree_content`` participates via md5(prose) + length cells (see
q_xml_subtree_content) so its constant table stays reviewable.
"""

from __future__ import annotations

GOLDEN_XML_LABEL_COUNTS_COLS = [('label', 'VARCHAR'), ('n_nodes', 'BIGINT')]
GOLDEN_XML_LABEL_COUNTS_ROWS = [
    ('Airplane', 6),
    ('LineNumber', 534),
    ('ServiceBulletin', 3),
    ('accomplishment_instructions', 3),
    ('airplanes', 3),
    ('appendix_a', 3),
    ('approval', 3),
    ('ata_system', 3),
    ('background', 3),
    ('compliance', 3),
    ('concurrent_requirements', 3),
    ('content', 4),
    ('description', 6),
    ('effectivity', 3),
    ('elapsed_hours', 7),
    ('header', 3),
    ('manpower', 3),
    ('material_information', 3),
    ('name', 4),
    ('number', 10),
    ('original_issue_date', 3),
    ('parts_required', 3),
    ('persons', 4),
    ('planning_information', 3),
    ('reason', 3),
    ('section', 4),
    ('spares_affected', 3),
    ('step', 14),
    ('subject', 3),
    ('summary', 3),
    ('task', 4),
    ('task_hours', 7),
    ('text', 7),
    ('title', 7),
    ('tooling_required', 3),
    ('total_per_airplane', 3),
    ('work_instructions', 3),
]

GOLDEN_XML_REL_SIGNATURES_COLS = [('src_label', 'VARCHAR'), ('rel_type', 'VARCHAR'), ('dst_label', 'VARCHAR'), ('n_edges', 'BIGINT')]
GOLDEN_XML_REL_SIGNATURES_ROWS = [
    ('Airplane', 'affected_by', 'effectivity', 6),
    ('Airplane', 'includes', 'LineNumber', 1166),
    ('LineNumber', 'included_in', 'Airplane', 1166),
    ('ServiceBulletin', 'HAS_ACCOMPLISHMENT_INSTRUCTIONS', 'accomplishment_instructions', 3),
    ('ServiceBulletin', 'HAS_APPENDIX_A', 'appendix_a', 3),
    ('ServiceBulletin', 'HAS_HEADER', 'header', 3),
    ('ServiceBulletin', 'HAS_MATERIAL_INFORMATION', 'material_information', 3),
    ('ServiceBulletin', 'HAS_PLANNING_INFORMATION', 'planning_information', 3),
    ('ServiceBulletin', 'HAS_SUMMARY', 'summary', 3),
    ('accomplishment_instructions', 'HAS_WORK_INSTRUCTIONS', 'work_instructions', 3),
    ('accomplishment_instructions', 'IS_PART_OF', 'ServiceBulletin', 3),
    ('airplanes', 'IS_PART_OF', 'effectivity', 3),
    ('appendix_a', 'HAS_SECTION', 'section', 4),
    ('appendix_a', 'HAS_TITLE', 'title', 3),
    ('appendix_a', 'IS_PART_OF', 'ServiceBulletin', 3),
    ('approval', 'IS_PART_OF', 'planning_information', 3),
    ('ata_system', 'IS_PART_OF', 'header', 3),
    ('background', 'IS_PART_OF', 'summary', 3),
    ('compliance', 'IS_PART_OF', 'planning_information', 3),
    ('concurrent_requirements', 'IS_PART_OF', 'planning_information', 3),
    ('content', 'IS_PART_OF', 'section', 4),
    ('description', 'HAS_STEP', 'step', 7),
    ('description', 'IS_PART_OF', 'planning_information', 3),
    ('description', 'IS_PART_OF', 'summary', 3),
    ('effectivity', 'HAS_AIRPLANES', 'airplanes', 3),
    ('effectivity', 'HAS_SPARES_AFFECTED', 'spares_affected', 3),
    ('effectivity', 'IS_PART_OF', 'planning_information', 3),
    ('effectivity', 'effects', 'Airplane', 6),
    ('elapsed_hours', 'IS_PART_OF', 'task', 4),
    ('elapsed_hours', 'IS_PART_OF', 'total_per_airplane', 3),
    ('header', 'HAS_ATA_SYSTEM', 'ata_system', 3),
    ('header', 'HAS_NUMBER', 'number', 3),
    ('header', 'HAS_ORIGINAL_ISSUE_DATE', 'original_issue_date', 3),
    ('header', 'HAS_SUBJECT', 'subject', 3),
    ('header', 'IS_PART_OF', 'ServiceBulletin', 3),
    ('manpower', 'HAS_TASK', 'task', 4),
    ('manpower', 'HAS_TOTAL_PER_AIRPLANE', 'total_per_airplane', 3),
    ('manpower', 'IS_PART_OF', 'planning_information', 3),
    ('material_information', 'HAS_PARTS_REQUIRED', 'parts_required', 3),
    ('material_information', 'HAS_TOOLING_REQUIRED', 'tooling_required', 3),
    ('material_information', 'IS_PART_OF', 'ServiceBulletin', 3),
    ('name', 'IS_PART_OF', 'task', 4),
    ('number', 'IS_PART_OF', 'header', 3),
    ('number', 'IS_PART_OF', 'step', 7),
    ('original_issue_date', 'IS_PART_OF', 'header', 3),
    ('parts_required', 'IS_PART_OF', 'material_information', 3),
    ('persons', 'IS_PART_OF', 'task', 4),
    ('planning_information', 'HAS_APPROVAL', 'approval', 3),
    ('planning_information', 'HAS_COMPLIANCE', 'compliance', 3),
    ('planning_information', 'HAS_CONCURRENT_REQUIREMENTS', 'concurrent_requirements', 3),
    ('planning_information', 'HAS_DESCRIPTION', 'description', 3),
    ('planning_information', 'HAS_EFFECTIVITY', 'effectivity', 3),
    ('planning_information', 'HAS_MANPOWER', 'manpower', 3),
    ('planning_information', 'HAS_REASON', 'reason', 3),
    ('planning_information', 'IS_PART_OF', 'ServiceBulletin', 3),
    ('reason', 'IS_PART_OF', 'planning_information', 3),
    ('section', 'HAS_CONTENT', 'content', 4),
    ('section', 'HAS_TITLE', 'title', 4),
    ('section', 'IS_PART_OF', 'appendix_a', 4),
    ('spares_affected', 'IS_PART_OF', 'effectivity', 3),
    ('step', 'HAS_NUMBER', 'number', 7),
    ('step', 'HAS_TEXT', 'text', 7),
    ('step', 'IS_PART_OF', 'description', 7),
    ('step', 'IS_PART_OF', 'work_instructions', 7),
    ('subject', 'IS_PART_OF', 'header', 3),
    ('summary', 'HAS_BACKGROUND', 'background', 3),
    ('summary', 'HAS_DESCRIPTION', 'description', 3),
    ('summary', 'IS_PART_OF', 'ServiceBulletin', 3),
    ('task', 'HAS_ELAPSED_HOURS', 'elapsed_hours', 4),
    ('task', 'HAS_NAME', 'name', 4),
    ('task', 'HAS_PERSONS', 'persons', 4),
    ('task', 'HAS_TASK_HOURS', 'task_hours', 4),
    ('task', 'IS_PART_OF', 'manpower', 4),
    ('task_hours', 'IS_PART_OF', 'task', 4),
    ('task_hours', 'IS_PART_OF', 'total_per_airplane', 3),
    ('text', 'IS_PART_OF', 'step', 7),
    ('title', 'IS_PART_OF', 'appendix_a', 3),
    ('title', 'IS_PART_OF', 'section', 4),
    ('tooling_required', 'IS_PART_OF', 'material_information', 3),
    ('total_per_airplane', 'HAS_ELAPSED_HOURS', 'elapsed_hours', 3),
    ('total_per_airplane', 'HAS_TASK_HOURS', 'task_hours', 3),
    ('total_per_airplane', 'IS_PART_OF', 'manpower', 3),
    ('work_instructions', 'HAS_STEP', 'step', 7),
    ('work_instructions', 'IS_PART_OF', 'accomplishment_instructions', 3),
]

GOLDEN_XML_KHOP_FLAGSHIP_COLS = [('seed_name', 'VARCHAR'), ('connected_names', 'VARCHAR'), ('n_connected', 'BIGINT')]
GOLDEN_XML_KHOP_FLAGSHIP_ROWS = [
    ('737-00-1028', '737-8,737-9,accomplishment_instructions,airplanes,appendix_a,approval,ata_system,background,compliance,concurrent_requirements,content,content,description,description,effectivity,header,manpower,material_information,number,original_issue_date,parts_required,planning_information,reason,section,section,spares_affected,step,step,step,step,subject,summary,task,task,title,title,title,tooling_required,total_per_airplane,work_instructions', 40),
]

GOLDEN_XML_SHARED_LINENUMBERS_COLS = [('line_number', 'VARCHAR'), ('n_bulletins', 'BIGINT')]
GOLDEN_XML_SHARED_LINENUMBERS_ROWS = [
    ('6542', 2),
    ('6562', 2),
    ('6582', 2),
    ('6612', 2),
    ('6630', 2),
    ('6652', 2),
    ('6672', 2),
    ('6690', 2),
    ('6722', 2),
    ('6740', 2),
    ('6762', 2),
    ('6780', 2),
    ('6792', 2),
    ('6810', 2),
    ('6830', 2),
    ('6850', 2),
    ('6852', 2),
    ('6872', 2),
    ('6890', 2),
    ('6920', 2),
    ('6922', 2),
    ('6940', 2),
    ('6942', 2),
    ('6960', 2),
    ('6970', 2),
    ('6980', 2),
    ('7000', 2),
    ('7010', 2),
    ('7020', 2),
    ('7030', 2),
    ('7040', 2),
    ('7050', 2),
    ('7060', 2),
    ('7062', 2),
    ('7070', 2),
    ('7090', 2),
    ('7100', 2),
    ('7120', 2),
    ('7130', 2),
    ('7140', 2),
    ('7150', 2),
    ('7160', 2),
    ('7170', 2),
    ('7190', 2),
    ('7220', 2),
    ('7250', 2),
    ('7350', 2),
    ('7370', 2),
    ('7430', 2),
]

GOLDEN_XML_SUBTREE_CONTENT_COLS = [('docnbr', 'VARCHAR'), ('section', 'VARCHAR'), ('content_md5', 'VARCHAR'), ('content_len', 'BIGINT'), ('n_fragments', 'BIGINT')]
GOLDEN_XML_SUBTREE_CONTENT_ROWS = [
    ('737-00-1028', 'accomplishment_instructions', 'bb3ceafc25968409c476d444ed6af323', 633, 4),
    ('737-00-1028', 'appendix_a', 'ccc45a1f1029edc15ede4cb1de98a657', 2205, 5),
    ('737-00-1028', 'header', 'ef30bd435e63789c9255c86603d83cf6', 142, 4),
    ('737-00-1028', 'material_information', '5c2ff08eee86020f2c1264a247bc942d', 9, 2),
    ('737-00-1028', 'planning_information', 'a6c0077bb6041cd82d444dcab779e1b6', 3512, 18),
    ('737-00-1028', 'summary', '3698bceaa2f3826e7efe93de596d26bb', 512, 2),
    ('737-00-1029', 'accomplishment_instructions', 'b9759c92c39f5b0a85b625fee3e2b031', 250, 6),
    ('737-00-1029', 'appendix_a', '10e87e5b7fb50a3424cea7eff7ff990b', 327, 3),
    ('737-00-1029', 'header', 'f934908114b67825d89ac6aa20743760', 87, 4),
    ('737-00-1029', 'material_information', '17920bb975ec750e7c8642e2901a38ff', 45, 2),
    ('737-00-1029', 'planning_information', 'f6db2d0d8d43dc0a7c3286031c751ecd', 1681, 15),
    ('737-00-1029', 'summary', '20b9a5602e372373666c06821d1e18bb', 371, 2),
    ('737-00-1030', 'accomplishment_instructions', '4b7f045b15bbf1b989e3b9b478e6b7ca', 206, 4),
    ('737-00-1030', 'appendix_a', '0c7a5cd8215dc283725acb10f30acc94', 321, 3),
    ('737-00-1030', 'header', '372d986bc82fed27c976e0b0cb7501fd', 85, 4),
    ('737-00-1030', 'material_information', '18f4e3e8f0c1decc3a0f52f58554d799', 31, 2),
    ('737-00-1030', 'planning_information', '57d893754a25faeacc09c3b1692a48d6', 1704, 14),
    ('737-00-1030', 'summary', '738f65887c86b99a2c0e2753a99826ea', 400, 2),
]

GOLDEN_XML_TITLE_HIERARCHY_COLS = [('docnbr', 'VARCHAR'), ('title_label', 'VARCHAR'), ('parent_label', 'VARCHAR')]
GOLDEN_XML_TITLE_HIERARCHY_ROWS = [
    ('737-00-1028', '1. operational readiness flight recommendations', 'Operational readiness flight'),
    ('737-00-1028', '2. operational readiness flight profile', 'Operational readiness flight'),
    ('737-00-1028', 'Operational readiness flight', 'ServiceBulletin'),
    ('737-00-1029', '1. fuel pump replacement instructions', 'Fuel pump replacement'),
    ('737-00-1029', 'Fuel pump replacement', 'ServiceBulletin'),
    ('737-00-1030', '1. hydraulic system pressure check instructions', 'Hydraulic system pressure check'),
    ('737-00-1030', 'Hydraulic system pressure check', 'ServiceBulletin'),
]

GOLDEN_XML_CONNECTED_COMPONENTS_COLS = [('n_nodes', 'BIGINT'), ('bulletins', 'VARCHAR')]
GOLDEN_XML_CONNECTED_COMPONENTS_ROWS = [
    (687, '737-00-1028,737-00-1029,737-00-1030'),
]

GOLDEN_GRAPH_MOTIF_CHAIN_COLS = [('docnbr', 'VARCHAR'), ('airplanes_head', 'VARCHAR'), ('airplanes_md5', 'VARCHAR'), ('airplanes_len', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_CHAIN_ROWS = [
    ('737-00-1028', '737-8 and 737-9 Airplane(s), line number', 'ad8462ee76a00ea8d53a1d151b70326c', 2269),
    ('737-00-1029', '737-8 and 737-9 Airplane(s), line number', '7a3d6ecbf9823e9b892230285d5e11fd', 810),
    ('737-00-1030', '737-8 and 737-9 Airplane(s), line number', '59edf5c152b648700a681b8e01c97315', 810),
]

GOLDEN_GRAPH_MOTIF_FANOUT_COLS = [('docnbr', 'VARCHAR'), ('subject', 'VARCHAR'), ('compliance_md5', 'VARCHAR'), ('compliance_len', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_FANOUT_ROWS = [
    ('737-00-1028', 'ADMINISTRATIVE GENERAL - Aircraft General - Angle of Attack Sensor System Test and Operational Readiness Flight', '64ab869b8e04beab9b9ff38b1b4fed21', 235),
    ('737-00-1029', 'ENGINE FUEL AND CONTROL - Engine Fuel Pump Replacement', '966ba51d5e90e5f51af1e37490ec7d12', 193),
    ('737-00-1030', 'HYDRAULIC POWER - Hydraulic System Pressure Check', '966ba51d5e90e5f51af1e37490ec7d12', 193),
]

GOLDEN_GRAPH_MOTIF_SHARED_COLS = [('line_number', 'VARCHAR'), ('doc_a', 'VARCHAR'), ('doc_b', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_SHARED_ROWS = [
    ('6542', '737-00-1028', '737-00-1030'),
    ('6562', '737-00-1028', '737-00-1030'),
    ('6582', '737-00-1028', '737-00-1030'),
    ('6612', '737-00-1028', '737-00-1030'),
    ('6630', '737-00-1028', '737-00-1029'),
    ('6652', '737-00-1028', '737-00-1030'),
    ('6672', '737-00-1028', '737-00-1030'),
    ('6690', '737-00-1028', '737-00-1029'),
    ('6722', '737-00-1028', '737-00-1030'),
    ('6740', '737-00-1028', '737-00-1029'),
    ('6762', '737-00-1028', '737-00-1030'),
    ('6780', '737-00-1028', '737-00-1029'),
    ('6792', '737-00-1028', '737-00-1030'),
    ('6810', '737-00-1028', '737-00-1029'),
    ('6830', '737-00-1028', '737-00-1029'),
    ('6850', '737-00-1028', '737-00-1029'),
    ('6852', '737-00-1028', '737-00-1030'),
    ('6872', '737-00-1028', '737-00-1030'),
    ('6890', '737-00-1028', '737-00-1029'),
    ('6920', '737-00-1028', '737-00-1029'),
    ('6922', '737-00-1028', '737-00-1030'),
    ('6940', '737-00-1028', '737-00-1029'),
    ('6942', '737-00-1028', '737-00-1030'),
    ('6960', '737-00-1028', '737-00-1029'),
    ('6970', '737-00-1028', '737-00-1029'),
    ('6980', '737-00-1028', '737-00-1029'),
    ('7000', '737-00-1028', '737-00-1029'),
    ('7010', '737-00-1028', '737-00-1029'),
    ('7020', '737-00-1028', '737-00-1029'),
    ('7030', '737-00-1028', '737-00-1029'),
    ('7040', '737-00-1028', '737-00-1029'),
    ('7050', '737-00-1028', '737-00-1029'),
    ('7060', '737-00-1028', '737-00-1029'),
    ('7062', '737-00-1028', '737-00-1030'),
    ('7070', '737-00-1028', '737-00-1029'),
    ('7090', '737-00-1028', '737-00-1029'),
    ('7100', '737-00-1028', '737-00-1029'),
    ('7120', '737-00-1028', '737-00-1029'),
    ('7130', '737-00-1028', '737-00-1029'),
    ('7140', '737-00-1028', '737-00-1029'),
    ('7150', '737-00-1028', '737-00-1029'),
    ('7160', '737-00-1028', '737-00-1029'),
    ('7170', '737-00-1028', '737-00-1029'),
    ('7190', '737-00-1028', '737-00-1029'),
    ('7220', '737-00-1028', '737-00-1029'),
    ('7250', '737-00-1028', '737-00-1029'),
    ('7350', '737-00-1028', '737-00-1029'),
    ('7370', '737-00-1028', '737-00-1029'),
    ('7430', '737-00-1028', '737-00-1029'),
]

GOLDEN_GRAPH_MOTIF_NEGATION_COLS = [('n_excluded', 'BIGINT'), ('min_line', 'BIGINT'), ('max_line', 'BIGINT'), ('line_checksum', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_NEGATION_ROWS = [
    (292, 5602, 7446, 1640611),
]

GOLDEN_GRAPH_MOTIF_VARLENGTH_COLS = [('docnbr', 'VARCHAR'), ('n_reachable', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_VARLENGTH_ROWS = [
    ('737-00-1028', 40),
    ('737-00-1029', 38),
    ('737-00-1030', 36),
]

GOLDEN_GRAPH_MOTIF_PARSED_COLS = [('docnbr', 'VARCHAR'), ('issue_date', 'VARCHAR'), ('subject', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_PARSED_ROWS = [
    ('737-00-1028', 'July 20, 2020', 'ADMINISTRATIVE GENERAL - Aircraft General - Angle of Attack Sensor System Test and Operational Readiness Flight'),
    ('737-00-1029', 'August 10, 2020', 'ENGINE FUEL AND CONTROL - Engine Fuel Pump Replacement'),
    ('737-00-1030', 'September 15, 2020', 'HYDRAULIC POWER - Hydraulic System Pressure Check'),
]

GOLDEN_GRAPH_MOTIF_OPTIONAL_COLS = [('docnbr', 'VARCHAR'), ('parent', 'VARCHAR'), ('step_head', 'VARCHAR'), ('step_len', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_OPTIONAL_ROWS = [
    ('737-00-1028', 'planning_information', '1. Do an Angle of Attack (AOA)', 50),
    ('737-00-1028', 'planning_information', '2. Do an Operational Readiness', 38),
    ('737-00-1028', 'summary', '(no steps)', -1),
    ('737-00-1029', 'planning_information', '1. Remove the existing fuel pu', 33),
    ('737-00-1029', 'planning_information', '2. Install the new fuel pump a', 38),
    ('737-00-1029', 'planning_information', '3. Perform a functional test o', 46),
    ('737-00-1029', 'summary', '(no steps)', -1),
    ('737-00-1030', 'planning_information', '1. Perform a hydraulic system ', 76),
    ('737-00-1030', 'planning_information', '2. Check for any leaks and rec', 48),
    ('737-00-1030', 'summary', '(no steps)', -1),
]

GOLDEN_GRAPH_MOTIF_EDGE_DISTINCT_COLS = [('mode', 'VARCHAR'), ('n_bindings', 'BIGINT'), ('n_lines', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_EDGE_DISTINCT_ROWS = [
    ('edge_distinct', 1558, 534),
    ('homomorphism', 2724, 534),
]

GOLDEN_GRAPH_MOTIF_EDGE_VAR_COLS = [('docnbr', 'VARCHAR'), ('rel_type', 'VARCHAR'), ('n_children', 'BIGINT'), ('first_child', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_EDGE_VAR_ROWS = [
    ('737-00-1028', 'HAS_NUMBER', 2, 'number'),
    ('737-00-1028', 'HAS_STEP', 2, 'step'),
    ('737-00-1028', 'HAS_TEXT', 2, 'text'),
    ('737-00-1028', 'IS_PART_OF', 6, 'description'),
    ('737-00-1029', 'HAS_NUMBER', 3, 'number'),
    ('737-00-1029', 'HAS_STEP', 3, 'step'),
    ('737-00-1029', 'HAS_TEXT', 3, 'text'),
    ('737-00-1029', 'IS_PART_OF', 8, 'description'),
    ('737-00-1030', 'HAS_NUMBER', 2, 'number'),
    ('737-00-1030', 'HAS_STEP', 2, 'step'),
    ('737-00-1030', 'HAS_TEXT', 2, 'text'),
    ('737-00-1030', 'IS_PART_OF', 6, 'description'),
]

GOLDEN_GRAPH_MOTIF_AGGREGATE_COLS = [('docnbr', 'VARCHAR'), ('n_lines', 'BIGINT'), ('n_bindings', 'BIGINT'), ('first_line', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_AGGREGATE_ROWS = [
    ('737-00-1028', 327, 654, '5602'),
    ('737-00-1029', 128, 256, '5603'),
    ('737-00-1030', 128, 256, '5604'),
]

GOLDEN_GRAPH_MOTIF_PIPELINE_COLS = [('docnbr', 'VARCHAR'), ('parent', 'VARCHAR'), ('out_deg', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_PIPELINE_ROWS = [
    ('737-00-1028', 'planning_information', 3),
    ('737-00-1029', 'planning_information', 4),
    ('737-00-1030', 'planning_information', 3),
]

GOLDEN_GRAPH_MOTIF_SHORTESTPATH_COLS = [('docnbr', 'VARCHAR'), ('hops', 'BIGINT'), ('n_nodes', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_SHORTESTPATH_ROWS = [
    ('737-00-1028', 1, 6),
    ('737-00-1028', 2, 19),
    ('737-00-1028', 3, 15),
    ('737-00-1028', 4, 341),
    ('737-00-1029', 1, 6),
    ('737-00-1029', 2, 18),
    ('737-00-1029', 3, 14),
    ('737-00-1029', 4, 140),
    ('737-00-1030', 1, 6),
    ('737-00-1030', 2, 18),
    ('737-00-1030', 3, 12),
    ('737-00-1030', 4, 138),
]

GOLDEN_GRAPH_MOTIF_TEXTPRED_COLS = [('docnbr', 'VARCHAR'), ('subject', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_TEXTPRED_ROWS = [
    ('737-00-1029', 'ENGINE FUEL AND CONTROL - Engine Fuel Pump Replacement'),
]

GOLDEN_GRAPH_MOTIF_COLLECT_COLS = [('line_number', 'VARCHAR'), ('docs', 'VARCHAR'), ('all_docs', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_COLLECT_ROWS = [
    ('6542', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6562', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6582', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6612', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6630', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6652', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6672', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6690', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6722', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6740', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6762', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6780', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6792', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6810', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6830', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6850', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6852', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6872', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6890', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6920', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6922', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6940', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6942', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('6960', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6970', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('6980', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7000', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7010', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7020', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7030', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7040', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7050', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7060', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7062', '737-00-1028;737-00-1030', '737-00-1028;737-00-1028;737-00-1030;737-00-1030'),
    ('7070', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7090', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7100', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7120', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7130', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7140', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7150', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7160', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7170', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7190', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7220', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7250', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7350', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7370', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
    ('7430', '737-00-1028;737-00-1029', '737-00-1028;737-00-1028;737-00-1029;737-00-1029'),
]

GOLDEN_GRAPH_MOTIF_OPTIONAL_CHAIN_COLS = [('docnbr', 'VARCHAR'), ('wi', 'VARCHAR'), ('step', 'VARCHAR'), ('step_num', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_OPTIONAL_CHAIN_ROWS = [
    ('737-00-1028', '(no wi)', '(no step)', '(none)'),
    ('737-00-1029', 'work_instructions', 'step', '1'),
    ('737-00-1029', 'work_instructions', 'step', '2'),
    ('737-00-1029', 'work_instructions', 'step', '3'),
    ('737-00-1030', '(no wi)', '(no step)', '(none)'),
]

GOLDEN_GRAPH_MOTIF_UNION_COLS = [('docnbr', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_UNION_ROWS = [
    ('737-00-1028',),
    ('737-00-1029',),
]

GOLDEN_GRAPH_MOTIF_OPTIONAL_WHERE_COLS = [('docnbr', 'VARCHAR'), ('parent', 'VARCHAR'), ('n_steps', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_OPTIONAL_WHERE_ROWS = [
    ('737-00-1028', 'planning_information', 0),
    ('737-00-1028', 'summary', 0),
    ('737-00-1029', 'planning_information', 3),
    ('737-00-1029', 'summary', 0),
    ('737-00-1030', 'planning_information', 0),
    ('737-00-1030', 'summary', 0),
]

GOLDEN_GRAPH_MOTIF_NUMERIC_COLS = [('docnbr', 'VARCHAR'), ('task', 'VARCHAR'), ('hours', 'VARCHAR'), ('persons', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_NUMERIC_ROWS = [
    ('737-00-1028', 'Operational Readiness Flight', '50', '5'),
    ('737-00-1029', 'Fuel Pump Replacement', '30', '3'),
]

GOLDEN_GRAPH_MOTIF_EXISTS_COLS = [('docnbr', 'VARCHAR'), ('parent', 'VARCHAR'), ('n_steps', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_EXISTS_ROWS = [
    ('737-00-1028', 'work_instructions', 2),
    ('737-00-1029', 'work_instructions', 3),
    ('737-00-1030', 'work_instructions', 2),
]

GOLDEN_GRAPH_MOTIF_COLLECT_NODE_COLS = [('docnbr', 'VARCHAR'), ('children', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_COLLECT_NODE_ROWS = [
    ('737-00-1028', '-2399337775691354451:header;-4656386351726218192:material_information;-6807463334954148719:planning_information;-944736282515524098:summary;1115388509733784207:accomplishment_instructions;2679030914527108300:appendix_a'),
    ('737-00-1029', '-1400934535846264000:accomplishment_instructions;-3094358331736922502:header;-48210339587833783:material_information;-643067188973892853:summary;5955026338150520470:appendix_a;7768920921961480767:planning_information'),
    ('737-00-1030', '-206320153630598367:planning_information;-3631707179577426087:accomplishment_instructions;-9152678936118456510:appendix_a;1164023641521140837:header;24666519394787463:summary;4534507130696854850:material_information'),
]

GOLDEN_GRAPH_MOTIF_CASE_COLS = [('band', 'VARCHAR'), ('n_tasks', 'BIGINT'), ('hours', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_CASE_ROWS = [
    ('heavy', 2, '40;50'),
    ('light', 1, '20'),
    ('medium', 1, '30'),
]

GOLDEN_GRAPH_MOTIF_NUMERIC_AGG_COLS = [('docnbr', 'VARCHAR'), ('n_tasks', 'BIGINT'), ('total_hours', 'BIGINT'), ('avg_hours', 'DOUBLE')]
GOLDEN_GRAPH_MOTIF_NUMERIC_AGG_ROWS = [
    ('737-00-1028', 2, 90, 45.0),
    ('737-00-1029', 1, 30, 30.0),
    ('737-00-1030', 1, 20, 20.0),
]

GOLDEN_GRAPH_MOTIF_WEIGHTED_COLS = [('docnbr', 'VARCHAR'), ('task', 'VARCHAR'), ('hours', 'VARCHAR'), ('weighted', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_WEIGHTED_ROWS = [
    ('737-00-1028', 'Angle of Attack (AOA) Sensor System Test', '40', 250),
    ('737-00-1028', 'Operational Readiness Flight', '50', 300),
]

GOLDEN_GRAPH_MOTIF_COND_AGG_COLS = [('docnbr', 'VARCHAR'), ('n_heavy', 'BIGINT'), ('n_light', 'BIGINT'), ('capped_hours', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_COND_AGG_ROWS = [
    ('737-00-1028', 2, 0, 70),
    ('737-00-1029', 1, 0, 30),
    ('737-00-1030', 0, 1, 20),
]

GOLDEN_GRAPH_MOTIF_SIZE_CONCAT_COLS = [('docnbr', 'VARCHAR'), ('n_tasks', 'BIGINT'), ('labels', 'VARCHAR'), ('min_name_len', 'BIGINT')]
GOLDEN_GRAPH_MOTIF_SIZE_CONCAT_ROWS = [
    ('737-00-1028', 2, 'Angle of Attack (AOA) Sensor System Test (40h);Operational Readiness Flight (50h)', 28),
    ('737-00-1029', 1, 'Fuel Pump Replacement (30h)', 21),
    ('737-00-1030', 1, 'Hydraulic System Pressure Check (20h)', 31),
]

GOLDEN_GRAPH_MOTIF_BOOLEXPR_COLS = [('team', 'VARCHAR'), ('n_tasks', 'BIGINT'), ('rems', 'VARCHAR')]
GOLDEN_GRAPH_MOTIF_BOOLEXPR_ROWS = [
    ('crew', 2, '0r;10r'),
    ('small', 1, '10r'),
]


def _values_sql(cols, rows):
    """Render a typed constant table: SELECT * FROM (VALUES ...) t(cols)."""
    def lit(v, t):
        if v is None:
            return f"CAST(NULL AS {t})"
        if t == "BIGINT":
            return f"CAST({int(v)} AS BIGINT)"
        if t == "DOUBLE":
            return f"CAST({float(v)!r} AS DOUBLE)"
        return "'" + str(v).replace("'", "''") + "'"
    vals = ",\n  ".join(
        "(" + ", ".join(lit(v, t) for (_, t), v in zip(cols, row)) + ")"
        for row in rows
    )
    names = ", ".join(c for c, _ in cols)
    return f"SELECT * FROM (VALUES\n  {vals}\n) AS t({names})"


ORACLE = {

    "xml_label_counts": _values_sql(GOLDEN_XML_LABEL_COUNTS_COLS, GOLDEN_XML_LABEL_COUNTS_ROWS),
    "xml_rel_signatures": _values_sql(GOLDEN_XML_REL_SIGNATURES_COLS, GOLDEN_XML_REL_SIGNATURES_ROWS),
    "xml_khop_flagship": _values_sql(GOLDEN_XML_KHOP_FLAGSHIP_COLS, GOLDEN_XML_KHOP_FLAGSHIP_ROWS),
    "xml_shared_linenumbers": _values_sql(GOLDEN_XML_SHARED_LINENUMBERS_COLS, GOLDEN_XML_SHARED_LINENUMBERS_ROWS),
    "xml_subtree_content": _values_sql(GOLDEN_XML_SUBTREE_CONTENT_COLS, GOLDEN_XML_SUBTREE_CONTENT_ROWS),
    "xml_title_hierarchy": _values_sql(GOLDEN_XML_TITLE_HIERARCHY_COLS, GOLDEN_XML_TITLE_HIERARCHY_ROWS),
    "xml_connected_components": _values_sql(GOLDEN_XML_CONNECTED_COMPONENTS_COLS, GOLDEN_XML_CONNECTED_COMPONENTS_ROWS),
    "graph_motif_chain": _values_sql(GOLDEN_GRAPH_MOTIF_CHAIN_COLS, GOLDEN_GRAPH_MOTIF_CHAIN_ROWS),
    "graph_motif_fanout": _values_sql(GOLDEN_GRAPH_MOTIF_FANOUT_COLS, GOLDEN_GRAPH_MOTIF_FANOUT_ROWS),
    "graph_motif_shared": _values_sql(GOLDEN_GRAPH_MOTIF_SHARED_COLS, GOLDEN_GRAPH_MOTIF_SHARED_ROWS),
    "graph_motif_negation": _values_sql(GOLDEN_GRAPH_MOTIF_NEGATION_COLS, GOLDEN_GRAPH_MOTIF_NEGATION_ROWS),
    "graph_motif_varlength": _values_sql(GOLDEN_GRAPH_MOTIF_VARLENGTH_COLS, GOLDEN_GRAPH_MOTIF_VARLENGTH_ROWS),
    "graph_motif_parsed": _values_sql(GOLDEN_GRAPH_MOTIF_PARSED_COLS, GOLDEN_GRAPH_MOTIF_PARSED_ROWS),
    "graph_motif_optional": _values_sql(GOLDEN_GRAPH_MOTIF_OPTIONAL_COLS, GOLDEN_GRAPH_MOTIF_OPTIONAL_ROWS),
    "graph_motif_edge_distinct": _values_sql(GOLDEN_GRAPH_MOTIF_EDGE_DISTINCT_COLS, GOLDEN_GRAPH_MOTIF_EDGE_DISTINCT_ROWS),
    "graph_motif_edge_var": _values_sql(GOLDEN_GRAPH_MOTIF_EDGE_VAR_COLS, GOLDEN_GRAPH_MOTIF_EDGE_VAR_ROWS),
    "graph_motif_aggregate": _values_sql(GOLDEN_GRAPH_MOTIF_AGGREGATE_COLS, GOLDEN_GRAPH_MOTIF_AGGREGATE_ROWS),
    "graph_motif_pipeline": _values_sql(GOLDEN_GRAPH_MOTIF_PIPELINE_COLS, GOLDEN_GRAPH_MOTIF_PIPELINE_ROWS),
    "graph_motif_shortestpath": _values_sql(GOLDEN_GRAPH_MOTIF_SHORTESTPATH_COLS, GOLDEN_GRAPH_MOTIF_SHORTESTPATH_ROWS),
    "graph_motif_textpred": _values_sql(GOLDEN_GRAPH_MOTIF_TEXTPRED_COLS, GOLDEN_GRAPH_MOTIF_TEXTPRED_ROWS),
    "graph_motif_collect": _values_sql(GOLDEN_GRAPH_MOTIF_COLLECT_COLS, GOLDEN_GRAPH_MOTIF_COLLECT_ROWS),
    "graph_motif_optional_chain": _values_sql(GOLDEN_GRAPH_MOTIF_OPTIONAL_CHAIN_COLS, GOLDEN_GRAPH_MOTIF_OPTIONAL_CHAIN_ROWS),
    "graph_motif_union": _values_sql(GOLDEN_GRAPH_MOTIF_UNION_COLS, GOLDEN_GRAPH_MOTIF_UNION_ROWS),
    "graph_motif_optional_where": _values_sql(GOLDEN_GRAPH_MOTIF_OPTIONAL_WHERE_COLS, GOLDEN_GRAPH_MOTIF_OPTIONAL_WHERE_ROWS),
    "graph_motif_numeric": _values_sql(GOLDEN_GRAPH_MOTIF_NUMERIC_COLS, GOLDEN_GRAPH_MOTIF_NUMERIC_ROWS),
    "graph_motif_exists": _values_sql(GOLDEN_GRAPH_MOTIF_EXISTS_COLS, GOLDEN_GRAPH_MOTIF_EXISTS_ROWS),
    "graph_motif_collect_node": _values_sql(GOLDEN_GRAPH_MOTIF_COLLECT_NODE_COLS, GOLDEN_GRAPH_MOTIF_COLLECT_NODE_ROWS),
    "graph_motif_case": _values_sql(GOLDEN_GRAPH_MOTIF_CASE_COLS, GOLDEN_GRAPH_MOTIF_CASE_ROWS),
    "graph_motif_numeric_agg": _values_sql(GOLDEN_GRAPH_MOTIF_NUMERIC_AGG_COLS, GOLDEN_GRAPH_MOTIF_NUMERIC_AGG_ROWS),
    "graph_motif_weighted": _values_sql(GOLDEN_GRAPH_MOTIF_WEIGHTED_COLS, GOLDEN_GRAPH_MOTIF_WEIGHTED_ROWS),
    "graph_motif_cond_agg": _values_sql(GOLDEN_GRAPH_MOTIF_COND_AGG_COLS, GOLDEN_GRAPH_MOTIF_COND_AGG_ROWS),
    "graph_motif_size_concat": _values_sql(GOLDEN_GRAPH_MOTIF_SIZE_CONCAT_COLS, GOLDEN_GRAPH_MOTIF_SIZE_CONCAT_ROWS),
    "graph_motif_boolexpr": _values_sql(GOLDEN_GRAPH_MOTIF_BOOLEXPR_COLS, GOLDEN_GRAPH_MOTIF_BOOLEXPR_ROWS),
}
