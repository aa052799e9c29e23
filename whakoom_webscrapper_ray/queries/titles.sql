# GET_TITLE_BY_ID
SELECT title_id, title, url, scrape_status
FROM titles
WHERE title_id = ?;

# GET_TITLES_FOR_LIST
SELECT t.title_id, t.title, t.url, j.position
FROM junction j
JOIN titles t USING (title_id)
WHERE j.list_id = ?
ORDER BY j.position;

# GET_LISTS_FOR_TITLE
SELECT l.list_id, l.title, l.user_profile, j.position
FROM junction j
JOIN lists l USING (list_id)
WHERE j.title_id = ?
ORDER BY l.list_id;

# GET_TITLE_DETAIL
SELECT m.title_id, m.name, m.synopsis, e.rating, e.additional_data
FROM title_metadata m
LEFT JOIN title_enriched e USING (title_id)
WHERE m.title_id = ?;

# GET_VOLUMES_FOR_TITLE
SELECT volume_id, title_id, volume_number, year
FROM volumes
WHERE title_id = ?
ORDER BY volume_number;

# COUNT_TITLES_BY_STATUS
SELECT scrape_status, COUNT(*) AS n
FROM titles
GROUP BY scrape_status
ORDER BY scrape_status;
