// Create a HashMap to hold the changed column values
var HashMap = Java.type('java.util.HashMap'); 
var map = new HashMap(); 

// Return the map with only the changed values for the row
if(symbol == 'FAX') {
    null;
}
else {
	map;
}
